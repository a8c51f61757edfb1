#!/bin/bash
# Round-3 TPU chain, part 20: harvest the int8 block-size sweep in-model.
#  1. 11B with tuned pick_blocks (now the int8_apply default) vs the
#     0.16834 record,
#  2. 11B int8-mixed (bf16 vision + tuned-int8 text) — the trace says the
#     vision tower's M=3328 matmuls are the bulk; XLA bf16 may beat even
#     the tuned int8 kernel there.
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain20.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain20.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -4 | tee -a "$LOGDIR/chain20.log"
}

run mme5_11b_tuned python bench.py --family mme5 --mme5-size 11b
run mme5_11b_mixed python bench.py --family mme5 --mme5-size 11b --mme5-quantize int8-mixed
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain20.log"
