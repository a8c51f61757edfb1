#!/bin/bash
# Round-3 TPU chain, part 8:
#  1. confirm the new split-program bench default (cache-hit rerun),
#  2. whole-row encoder attention kernel vs XLA standalone
#     (scripts/enc_attn_bench.py -> enc_attn_results.json),
#  3. in-model A/B: MMTPU_ENC_ATTN=1 swaps the ViT attention inside the
#     split embed program (~38 ms/page of XLA logits passes at stake).
set -u
cd /root/repo
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain8.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain8.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -4 | tee -a "$LOGDIR/chain8.log"
}

run headline_split_default python bench.py
run enc_attn_micro python scripts/enc_attn_bench.py
run headline_enc_attn env MMTPU_ENC_ATTN=1 python bench.py
# 4. re-queue the 11B embed-chunk A/B that chain 7 lost to session end
#    (chunk 2 is the measured default at 0.16445 p/s; does 8 amortize?)
run mme5_11b_chunk8 python bench.py --family mme5 --mme5-size 11b --mme5-chunk 8
# 5. real-deployment serving A/B: pipelined (prefetch-decode + async
#    dispatch + writer overlap) vs sequential ingest at 2200x1700 pages
run serve_pipeline python scripts/serve_pipeline_bench.py
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain8.log"
