#!/bin/bash
# Round-3 TPU chain, part 6: 11B embed-chunk scaling after short tile
# stacks. Chunk 2 was the OOM envelope of the OLD 4-tile 6432-token
# vision attention; single-tile short stacks (1608 tokens) shrink the
# chunk-8 logits transient to ~660MB, and the embed is weight-streaming
# bound (~10GB int8/chunk execution), so chunk 8 should cut weight
# traffic per crop ~4x. (vs BENCH_MME5_11B.json chunk-2 = 0.16445 p/s)
set -u
cd /root/repo
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain6.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain6.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -3 | tee -a "$LOGDIR/chain6.log"
}

run mme5_11b_chunk8 python bench.py --family mme5 --mme5-size 11b --mme5-chunk 8
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain6.log"
