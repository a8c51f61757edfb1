#!/bin/bash
# Round-3 TPU chain, part 17: profile the 11B parity embedder (where do
# the 125 ms/crop go? the 2B shares the vision tower at ~27 ms/crop, so
# ~100 ms/crop is unattributed text-side int8 work — if weight-streaming
# bound it runs at ~47GB/s), plus the cheap chunk-size A/Bs the new
# attention kernel may have shifted (2B chunk 16, 11B chunk 4).
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain17.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain17.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -4 | tee -a "$LOGDIR/chain17.log"
}

rm -rf /tmp/trace_11b
run mme5_11b_profile python bench.py --family mme5 --mme5-size 11b --profile /tmp/trace_11b
run trace_11b_report python -m multimodal_embeddings_tpu.utils.trace_analysis /tmp/trace_11b --top 40
run mme5_chunk16 python bench.py --family mme5 --mme5-chunk 16
run mme5_11b_chunk4 python bench.py --family mme5 --mme5-size 11b --mme5-chunk 4
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain17.log"
