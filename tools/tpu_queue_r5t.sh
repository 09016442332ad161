#!/bin/bash
# Round-5 queue t (waits for r5s): ViT-H retry with the 64MB budget.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5t.log
echo "=== queue_r5t waiting for r5s $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5s.done ]; do sleep 60; done
echo "=== queue_r5t start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg vith 2400 env BENCH_NO_WATCHDOG=1 BENCH_SAM=facebook/sam-vit-huge BENCH_SIZE=2048 BENCH_BATCH=2 python bench.py
leg vith_int8 2400 env BENCH_NO_WATCHDOG=1 BENCH_SAM=facebook/sam-vit-huge BENCH_SIZE=2048 BENCH_BATCH=2 BENCH_QUANT=int8 python bench.py
echo "=== queue_r5t done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5t.done
