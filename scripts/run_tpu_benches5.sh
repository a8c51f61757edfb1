#!/bin/bash
# Round-3 TPU chain, part 5:
#   1. headline with AUTO embedder-arg layouts (candidate for the last 2%
#      vs round-2's both-closure 5.17; vs detector-closure 5.0694)
#   2. mme5 2B with the split path's new detector-closure default
#      (vs 0.6165 measured with args-mode detect)
set -u
cd /root/repo
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain5.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain5.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -3 | tee -a "$LOGDIR/chain5.log"
}

run headline_auto_layouts python bench.py --auto-layouts
run mme5_closure_det      python bench.py --family mme5
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain5.log"
