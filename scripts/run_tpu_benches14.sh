#!/bin/bash
# Round-3 TPU chain, part 14:
#  1. LN-stats Pallas kernel A/B in the headline embed program (chain-12
#     trace: 27 standalone convert_reduce LN-stats ops ~24 ms/page of a
#     ~168 ms page; kernels/ln_stats.py replaces just the stats reduce),
#  2. headline control (also re-records the canonical default after the
#     record-gating fix),
#  3. profile the NEW mme5 default (row-blocked kernel, 0.7842 p/s) to
#     rank its next candidates.
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain14.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain14.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -4 | tee -a "$LOGDIR/chain14.log"
}

run headline_ln_stats env MMTPU_LN_STATS=1 python bench.py
run headline_control python bench.py
rm -rf /tmp/trace_mme5_r3
run mme5_profile python bench.py --family mme5 --profile /tmp/trace_mme5_r3
run mme5_trace_report python -m multimodal_embeddings_tpu.utils.trace_analysis /tmp/trace_mme5_r3
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain14.log"
