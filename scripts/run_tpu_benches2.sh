#!/bin/bash
# Round-3 TPU chain, part 2: fixed mme5-2B bench, closure-vs-arg headline
# A/B, attention + LN-matmul candidate microbenches.
set -u
cd /root/repo
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain2.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  rc=$?
  echo "=== $name done rc=$rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain2.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -3 | tee -a "$LOGDIR/chain2.log"
}

run headline_closure  python bench.py
run headline_args2    python bench.py --arg-weights
run mme5_2b_fixed     python bench.py --family mme5
run attn_cand2        python scripts/attn_candidates_bench.py
run ln_matmul2        python scripts/ln_matmul_bench.py
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain2.log"
