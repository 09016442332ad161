#!/bin/bash
# Round-5 queue g (waits for r5f): relpos-v2 re-measure in the chained
# harness (the r3 negative verdict came from full-bench A/Bs whose
# 190s-recompile cost precluded iteration; chain legs are ~40 s), at
# both default and v2 table builders.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5g.log
echo "=== queue_r5g waiting for r5f $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5f.done ]; do sleep 60; done
echo "=== queue_r5g start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg chain_relposv2 1800 env SAM_RELPOS_V2=1 python tools/chain_bench.py /tmp/prof_rp2
echo "=== queue_r5g done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5g.done
