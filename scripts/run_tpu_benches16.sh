#!/bin/bash
# Round-3 TPU chain, part 16: LN-stats lane-sum strategy microbench
# (reduce vs chunk vs dot vs the XLA reduce), then in-model mme5 A/Bs of
# any strategy that clearly beats the XLA reduce standalone (>=1.5x the
# effective GB/s at the mme5 shape). Chain-15 context: the 'reduce'
# kernel lost ~2% in-model at both mme5 sizes.
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOGDIR/chain16.log"
  timeout 7200 "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit $rc ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain16.log"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$name.log" | tail -6 | tee -a "$LOGDIR/chain16.log"
}

run ln_stats_micro python scripts/ln_stats_bench.py

best=$(python - <<'EOF'
import json
try:
    r = json.load(open("scripts/ln_stats_results.json"))["mme5_8x1608x1280"]
    xla = r.get("xla_reduce", {}).get("GB/s") or 1e9
    cands = [
        (v.get("GB/s", 0), k.split("_", 1)[1])
        for k, v in r.items()
        if k.startswith("pallas_") and isinstance(v.get("GB/s"), (int, float))
    ]
    gbs, name = max(cands) if cands else (0, "")
    print(name if gbs >= 1.5 * xla else "")
except Exception:
    print("")
EOF
)
echo "selected in-model candidate: '$best'" | tee -a "$LOGDIR/chain16.log"
if [ -n "$best" ]; then
  run "mme5_ln_$best" env MMTPU_LN_STATS=1 MMTPU_LN_STATS_METHOD=$best python bench.py --family mme5
  run "mme5_11b_ln_$best" env MMTPU_LN_STATS=1 MMTPU_LN_STATS_METHOD=$best python bench.py --family mme5 --mme5-size 11b
fi
echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOGDIR/chain16.log"
