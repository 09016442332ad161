#!/bin/bash
# Round-5 queue u (waits for r5t): window-crop retry with the 32-bit
# roll fix on config 1.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5u.log
echo "=== queue_r5u waiting for r5t $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5t.done ]; do sleep 60; done
echo "=== queue_r5u start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg c1_crop2 2400 env SAM_WINDOW_CROP=1 BENCH_NO_WATCHDOG=1 python bench.py
echo "=== queue_r5u done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5u.done
