#!/bin/bash
# Round-5 queue i (waits for r5h): the merged-window contraction A/B —
# the structural response to the r5e ablation verdict (QK dot at ~20%
# MXU efficiency is the windowed kernel's dominant cost).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5i.log
echo "=== queue_r5i waiting for r5h $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5h.done ]; do sleep 60; done
echo "=== queue_r5i start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg chain_wpair    1800 env SAM_FLASH_WPAIR=1 python tools/chain_bench.py /tmp/prof_wp1
leg chain_wpair_vs 1800 env SAM_FLASH_WPAIR=1 SAM_FLASH_VSUM=1 python tools/chain_bench.py /tmp/prof_wp2
echo "=== queue_r5i done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5i.done
