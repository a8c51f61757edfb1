#!/bin/bash
# Round-3 TPU chain, part 15: row-chunked LN-stats kernel at the mme5
# Mllama shapes — its trace shows ~40 LN-stats reduces at (8,1608,1280)
# (33MB/site @ ~18GB/s) = 35% of mme5 device time; the row-chunked grid
# (rb=536) amortizes per-program overhead far better than the ViT-B
# one-row shape that washed in chain 14.
#  1. mme5-2B with the kernel (vs 0.7842 default),
#  2. mme5-11B with the kernel (vs 0.16834),
#  3. fresh control (noise guard).
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain15.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain15.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -4 | tee -a "$LOGDIR/chain15.log"
}

run mme5_ln_stats env MMTPU_LN_STATS=1 python bench.py --family mme5
run mme5_11b_ln_stats env MMTPU_LN_STATS=1 python bench.py --family mme5 --mme5-size 11b
run mme5_control python bench.py --family mme5
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain15.log"
