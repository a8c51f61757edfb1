#!/usr/bin/env bash
# Numbered-pipeline runner — the reference run.sh equivalent
# (reference run.sh:60-70 folder conventions), driving the TPU-native
# stage CLIs in one process each.
set -euo pipefail

INPUT=${1:-newspaper_images}

python -m multimodal_embeddings_tpu.cli.orientation "$INPUT" 0_oriented_images

python -m multimodal_embeddings_tpu.cli.detect \
  --input_folder 0_oriented_images --output_folder 1_doclayout_parsed \
  --grid_configs 2x2,3x3,4x4

python -m multimodal_embeddings_tpu.cli.edge_filter \
  --input_folder 1_doclayout_parsed --output_folder 2_edge_box_filtered

python -m multimodal_embeddings_tpu.cli.combine \
  --input_folder 2_edge_box_filtered --output_folder 3_combined_bboxes

python -m multimodal_embeddings_tpu.cli.medians \
  --input_folder 3_combined_bboxes --output_folder 4_medians_extracted

python -m multimodal_embeddings_tpu.cli.columns \
  --input_folder 3_combined_bboxes --median_folder 4_medians_extracted \
  --output_folder 5_column_detection

# Optional stretch stage (the reference's Qwen2.5-VL notebook as a CLI):
# MMTPU_PARSE_HTML=1 ./run.sh parses pages into QwenVL HTML with
# data-bbox attributes (needs a checkpoint for real output quality).
if [ "${MMTPU_PARSE_HTML:-0}" = "1" ]; then
  python -m multimodal_embeddings_tpu.cli.parse \
    --input_folder 0_oriented_images --output_folder 6_parsed_html \
    --size "${MMTPU_PARSE_SIZE:-3b}" --draw_bbox
fi
