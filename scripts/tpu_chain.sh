#!/bin/bash
# Consolidated TPU measurement chain runner (replaces the accumulated
# run_tpu_benches*.sh drivers — one runner, chains described as command
# files; round-by-round chain provenance lives in ROADMAP.md).
#
# Usage:  scripts/tpu_chain.sh <chain-name> <commands-file>
#
# The commands file has one run per line:   <label> <command...>
# Blank lines and #-comments are skipped. Each run is bounded by
# `timeout 7200`, its full output goes to /tmp/tpu_bench_logs/<label>.log,
# and a 4-line tail is appended to /tmp/tpu_bench_logs/<chain-name>.log.
# Runs are strictly sequential: ONE process may hold the TPU tunnel at a
# time (CLAUDE.md — even a CPU-computing process that loaded the axon
# plugin holds the lock).
set -u
cd "$(dirname "$0")/.."
CHAIN=${1:?chain name}
CMDS=${2:?commands file}
LOGDIR=/tmp/tpu_bench_logs
mkdir -p "$LOGDIR"
CHAINLOG="$LOGDIR/$CHAIN.log"

echo "### chain $CHAIN start $(date +%F\ %H:%M:%S)" | tee -a "$CHAINLOG"
while IFS= read -r line; do
  case "$line" in ''|'#'*) continue ;; esac
  label=${line%% *}
  cmd=${line#* }
  echo "=== $label: $cmd ($(date +%H:%M:%S)) ===" | tee -a "$CHAINLOG"
  timeout 7200 bash -c "$cmd" >"$LOGDIR/$label.log" 2>&1
  rc=$?
  echo "--- $label exit $rc ($(date +%H:%M:%S))" | tee -a "$CHAINLOG"
  grep -v "SIGILL\|machine feature" "$LOGDIR/$label.log" | tail -4 | tee -a "$CHAINLOG"
done < "$CMDS"
echo "### chain $CHAIN done $(date +%F\ %H:%M:%S)" | tee -a "$CHAINLOG"
