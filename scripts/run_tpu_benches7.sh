#!/bin/bash
# Round-3 TPU chain, part 7:
#  1. fresh xplane profile of the CURRENT headline default (detector-
#     closure, 5.069 p/s) — the last trace was args-mode; refresh the
#     per-op worklist against what actually ships,
#  2. split-siglip A/B: two programs, detector-closure detect+crop PLUS
#     embedder-closure embed (~172MB bf16 body — probes the tunnel's
#     HTTP 413 limit; recovers both-closure constant folding if it fits),
#  3. head-dim packing microbench (ROADMAP candidate, never yet run),
#  4. the REAL 11B chunk-8 A/B (the first attempt silently re-ran chunk 2
#     through the --mme5-chunk sentinel collision, fixed in bench.py).
set -u
cd /root/repo
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain7.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain7.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -4 | tee -a "$LOGDIR/chain7.log"
}

run headline_prof_det python bench.py --profile /tmp/headline_trace_det_r3
run trace_report_det python -m multimodal_embeddings_tpu.utils.trace_analysis /tmp/headline_trace_det_r3
run split_siglip python bench.py --closure-weights split
run headdim_pack python scripts/headdim_packing_bench.py
run mme5_11b_chunk8 python bench.py --family mme5 --mme5-size 11b --mme5-chunk 8
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain7.log"
