#!/bin/bash
# Round-5 queue s (waits for r5r): c1/c2 headline retries — once with
# the roll-based pallas window crop (SAM_WINDOW_CROP=1, its first device
# compile) and once on the guaranteed gather default.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5s.log
echo "=== queue_r5s waiting for r5r $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5r.done ]; do sleep 60; done
echo "=== queue_r5s start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg c1_crop   2400 env SAM_WINDOW_CROP=1 BENCH_NO_WATCHDOG=1 python bench.py
leg c1_plain  2400 env BENCH_NO_WATCHDOG=1 python bench.py
leg c2_crop   2400 env SAM_WINDOW_CROP=1 BENCH_NO_WATCHDOG=1 BENCH_SAM=mobile-sam python bench.py
echo "=== queue_r5s done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5s.done
