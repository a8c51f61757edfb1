#!/bin/bash
# Round-3 TPU chain, part 13: the mme5 static-prefix kernel dispatch with
# the row-blocked kernel (chain-11's whole-row variant OOM'd scoped VMEM
# at the 1616-token shape; rb=608 fits with margin):
#  1. mme5-2B with key_valid_len -> row-blocked kernel (vs 0.6316 XLA),
#  2. mme5-11B end-to-end same (vs 0.16445),
#  3. control: kernel off at mme5-2B (regression guard).
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain13.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain13.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -4 | tee -a "$LOGDIR/chain13.log"
}

run mme5_kvl_rb python bench.py --family mme5
run mme5_11b_kvl_rb python bench.py --family mme5 --mme5-size 11b
run mme5_encattn_off env MMTPU_ENC_ATTN=0 python bench.py --family mme5
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain13.log"
