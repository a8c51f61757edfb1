#!/bin/bash
# Round-3 TPU chain, part 10: re-run the two chain-9 items that crashed on
# bugs fixed since the snapshot (commit d4942e9), plus the mme5 enc-attn A/B:
#  1. packed-int4 Pallas matmul micro (chain-9 hit the 2-D scale BlockSpec
#     Mosaic rule; the scale now rides as a (n_groups, 1, N) operand),
#  2. in-model whole-row encoder attention on the headline split program
#     (chain-9 hit the Dv!=Dk reshape in the detector PSA dispatch; the
#     kernel now carries Dv independently) — standalone the kernel is 39%
#     faster than XLA at the ViT-B shape,
#  3. same A/B on the mme5-2B split (kernel 47% faster standalone at the
#     padded Mllama vision shape),
#  4. full 11B int4 forward (weight-bandwidth probe vs 126.7 ms/crop int8).
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain10.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain10.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -4 | tee -a "$LOGDIR/chain10.log"
}

run int4_micro python scripts/int4_kernel_smoke.py --micro
run headline_enc_attn env MMTPU_ENC_ATTN=1 python bench.py
run mme5_enc_attn env MMTPU_ENC_ATTN=1 python bench.py --family mme5
run int4_11b_full python scripts/int4_kernel_smoke.py --full --batch 2
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain10.log"
