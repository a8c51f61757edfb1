#!/bin/bash
# Round-3 TPU chain, part 9 (re-queue of chain 8 lost to the VM restart,
# plus the new int4 path):
#  1. headline split-default on the fresh compile cache (also warms the
#     driver's end-of-round bench.py programs),
#  2. packed-int4 Pallas matmul on real hardware (exactness + latency vs
#     int8 kernel / XLA bf16),
#  3. whole-row encoder attention kernel vs XLA standalone,
#  4. in-model A/B: MMTPU_ENC_ATTN=1 swaps the ViT attention inside the
#     split embed program (~38 ms/page of XLA logits passes at stake),
#  5. real-deployment serving A/B: pipelined ingest vs sequential,
#  6. 11B embed-chunk A/B (chunk 2 default = 0.16445 p/s; does 8 amortize?),
#  7. full 11B int4 forward (~5.5GB weights; weight-bandwidth probe vs
#     the 126.7 ms/crop int8 rate).
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain9.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain9.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -4 | tee -a "$LOGDIR/chain9.log"
}

run headline_split_default python bench.py
run int4_micro python scripts/int4_kernel_smoke.py --micro
run enc_attn_micro python scripts/enc_attn_bench.py
run headline_enc_attn env MMTPU_ENC_ATTN=1 python bench.py
run serve_pipeline python scripts/serve_pipeline_bench.py
run mme5_11b_chunk8 python bench.py --family mme5 --mme5-size 11b --mme5-chunk 8
run int4_11b_full python scripts/int4_kernel_smoke.py --full --batch 2
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain9.log"
