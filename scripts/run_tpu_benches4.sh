#!/bin/bash
# Round-3 TPU chain, part 4 (sequential attribution on the headline):
#   1. weights-as-args + fixpoint NMS      (vs 4.2126 args + scan NMS)
#   2. detector-closure + fixpoint NMS     (the 413-safe constant-folding slice)
#   3. mme5 2B with the fc1-site LN fusion (measured-win site, ln_matmul_results)
set -u
cd /root/repo
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain4.log"
  timeout 10000 "$@" >"$LOGDIR/$name.log" 2>&1
  rc=$?
  echo "=== $name done rc=$rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain4.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -3 | tee -a "$LOGDIR/chain4.log"
}

run headline_fixnms      python bench.py
run headline_closure_det python bench.py --closure-weights detector
run mme5_fuse_ln         python bench.py --family mme5 --fuse-ln
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain4.log"
