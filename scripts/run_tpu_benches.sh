#!/bin/bash
# Sequential TPU measurement chain for round 3 (one process at a time —
# the axon tunnel serializes the chip). Logs land in /tmp/tpu_bench_logs.
set -u
cd /root/repo
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  rc=$?
  echo "=== $name done rc=$rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain.log"
  tail -3 "$LOGDIR/$name.log" | tee -a "$LOGDIR/chain.log"
}

run headline      python bench.py
run letterbox     python bench.py --letterbox
run mme5_2b       python bench.py --family mme5
run mme5_11b      python bench.py --family mme5 --mme5-size 11b
run attn_cand     python scripts/attn_candidates_bench.py
run ln_matmul     python scripts/ln_matmul_bench.py
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain.log"
