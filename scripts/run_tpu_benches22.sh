#!/bin/bash
# Round-3 TPU chain, part 22: embed-chunk re-A/B at int8-mixed — the
# chunk-2 default was set when the program was per-step-overhead-bound
# (709 ms/crop era); at 37.8 ms/crop the text weight streaming (~9GB per
# exec, near HBM rate) now amortizes over more crops per exec.
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain22.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain22.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -4 | tee -a "$LOGDIR/chain22.log"
}

run mme5_11b_mixed_chunk4 python bench.py --family mme5 --mme5-size 11b --mme5-chunk 4
run mme5_11b_mixed_chunk8 python bench.py --family mme5 --mme5-size 11b --mme5-chunk 8
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain22.log"
