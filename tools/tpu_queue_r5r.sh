#!/bin/bash
# Round-5 queue r (waits for r5o; replaces the killed r5p/r5q waiters in
# the right order): headline config-1 full bench FIRST (window_crop fix
# + new flash defaults), then the ladder refresh.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5r.log
echo "=== queue_r5r waiting for r5o $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5o.done ]; do sleep 60; done
echo "=== queue_r5r start $(date) ===" >> "$LOG"
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
leg c2_full 2400 env BENCH_NO_WATCHDOG=1 BENCH_SAM=mobile-sam python bench.py
leg vitl 2400 env BENCH_NO_WATCHDOG=1 BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=32 python bench.py
leg vith 2400 env BENCH_NO_WATCHDOG=1 BENCH_SAM=facebook/sam-vit-huge BENCH_SIZE=2048 BENCH_BATCH=2 python bench.py
leg vitb_int8 2400 env BENCH_NO_WATCHDOG=1 BENCH_QUANT=int8 python bench.py
leg vitl_int8 2400 env BENCH_NO_WATCHDOG=1 BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=32 BENCH_QUANT=int8 python bench.py
leg vith_int8 2400 env BENCH_NO_WATCHDOG=1 BENCH_SAM=facebook/sam-vit-huge BENCH_SIZE=2048 BENCH_BATCH=2 BENCH_QUANT=int8 python bench.py
echo "=== queue_r5r done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5r.done
