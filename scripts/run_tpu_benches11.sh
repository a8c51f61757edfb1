#!/bin/bash
# Round-3 TPU chain, part 11: land the chain-10 enc-attn win as default and
# measure the newly-wired dispatch sites:
#  1. headline with the kernel DEFAULT ON (chain-10 A/B: 5.82 vs 5.42 p/s)
#     + the r3 stage-2 edge filter in the fused path (elementwise, ~free)
#     — refreshes BENCH_LAST_GOOD and warms the driver cache,
#  2. mme5-2B with the static-prefix kernel dispatch in the Mllama vision
#     tower (sdpa key_valid_len → whole-row kernel; 47% faster standalone
#     at the padded 1616-token shape),
#  3. mme5-11B end-to-end with the same dispatch (vs 0.16445 p/s chunk-2),
#  4. enc-attn OFF control on the headline (regression guard for the
#     default flip: expect ~5.42).
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain11.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain11.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -4 | tee -a "$LOGDIR/chain11.log"
}

run headline_default python bench.py
run mme5_kvl python bench.py --family mme5
run mme5_11b_kvl python bench.py --family mme5 --mme5-size 11b
run headline_encattn_off env MMTPU_ENC_ATTN=0 python bench.py
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain11.log"
