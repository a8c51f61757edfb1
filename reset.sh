#!/usr/bin/env bash
# Wipe derived state (reference reset.sh equivalent): store, outputs,
# reports, progress files.
set -euo pipefail
rm -rf db output cross_compare region_compare testout \
  0_oriented_images 1_doclayout_parsed 2_edge_box_filtered \
  3_combined_bboxes 4_medians_extracted 5_column_detection \
  newspaper_process.log
echo "workspace reset"
