#!/bin/bash
# Round-3 TPU chain, part 3: 11B re-bench with short tile stacks + a
# profiled headline run for the 4.21 regression attribution.
set -u
cd /root/repo
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain3.log"
  timeout 10000 "$@" >"$LOGDIR/$name.log" 2>&1
  rc=$?
  echo "=== $name done rc=$rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain3.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -3 | tee -a "$LOGDIR/chain3.log"
}

run mme5_11b_short   python bench.py --family mme5 --mme5-size 11b
rm -rf /tmp/headline_trace
run headline_prof    python bench.py --profile /tmp/headline_trace
run trace_report     python -m multimodal_embeddings_tpu.utils.trace_analysis /tmp/headline_trace
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain3.log"
