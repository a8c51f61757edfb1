#!/bin/bash
# Round-3 TPU chain, part 18: int8_matmul block-size sweep at the 11B
# serving shapes (text M≈32 / vision M≈3216) — the fixed (128,128,512)
# blocks put per-grid-step overhead far above the real work at small M.
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain18.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain18.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -8 | tee -a "$LOGDIR/chain18.log"
}

run int8_tune python scripts/int8_tune_bench.py
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain18.log"
