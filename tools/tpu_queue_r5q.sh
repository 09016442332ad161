#!/bin/bash
# Round-5 queue q (waits for r5p): retry the full-bench legs that hit
# the window_crop dynamic_slice lowering bug (fixed: ref-level pl.ds).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5q.log
echo "=== queue_r5q waiting for r5p $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5p.done ]; do sleep 60; done
echo "=== queue_r5q start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg c1_full 2400 env BENCH_NO_WATCHDOG=1 python bench.py
leg vitl_sanity 2400 env BENCH_NO_WATCHDOG=1 BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=32 python bench.py
echo "=== queue_r5q done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5q.done
