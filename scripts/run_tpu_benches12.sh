#!/bin/bash
# Round-3 TPU chain, part 12: profile the new headline configuration
# (enc-attn kernel default + fused edge filter, 5.81 p/s) and re-rank the
# next optimization candidates from the per-op trace.
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain12.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain12.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -4 | tee -a "$LOGDIR/chain12.log"
}

rm -rf /tmp/trace_r3b
run headline_profile python bench.py --profile /tmp/trace_r3b
run trace_report python -m multimodal_embeddings_tpu.utils.trace_analysis /tmp/trace_r3b
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain12.log"
