#!/bin/bash
# Round-3 TPU chain, part 21: int4 retune harvest + the new 11B
# bottleneck.
#  1. 11B pure int4 with multi-group k-steps + wide-N blocks (chain-10
#     verdict to beat: int4 end-to-end 1248 ms/crop ~ 2.2x slower than
#     int8; if the blocking was the whole story it should now approach
#     or beat int8's streaming),
#  2. 11B int4-mixed (bf16 vision + retuned int4 text) vs the 0.55057
#     int8-mixed default,
#  3. profile the int8-mixed default for the next worklist.
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain21.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain21.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -4 | tee -a "$LOGDIR/chain21.log"
}

run mme5_11b_int4_v2 python bench.py --family mme5 --mme5-size 11b --mme5-quantize int4
run mme5_11b_int4_mixed python bench.py --family mme5 --mme5-size 11b --mme5-quantize int4-mixed
rm -rf /tmp/trace_11b_mixed
run mme5_11b_mixed_profile python bench.py --family mme5 --mme5-size 11b --profile /tmp/trace_11b_mixed
run trace_11b_mixed_report python -m multimodal_embeddings_tpu.utils.trace_analysis /tmp/trace_11b_mixed --top 30
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain21.log"
