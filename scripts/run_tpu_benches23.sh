#!/bin/bash
# Round-3 TPU chain, part 23: BLHD encoder-attention in-model A/B at the
# headline (kills ~7.5 ms/page of QKV relayout copies around the BHLD
# custom call IF the strided slab reads don't cost more) + control.
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain23.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain23.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -4 | tee -a "$LOGDIR/chain23.log"
}

run headline_blhd env MMTPU_ENC_ATTN_BLHD=1 python bench.py
run headline_control2 python bench.py
run mme5_blhd env MMTPU_ENC_ATTN_BLHD=1 python bench.py --family mme5
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain23.log"
