#!/bin/bash
# Round-4 queue d: BASELINE ladder refresh on the r4 tree + ViT-L int8
# accuracy bounds (the README table backs every int8 entry with measured
# accuracy; ViT-B landed in r4a).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r4d.log
echo "=== queue_r4d start $(date) ===" >> "$LOG"
until timeout 600 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"; sleep 180
done
echo "RELAY OK $(date)" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg vitl 2400 env BENCH_NO_WATCHDOG=1 BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=32 python bench.py
leg vitl_int8 2400 env BENCH_NO_WATCHDOG=1 BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=32 BENCH_QUANT=int8 python bench.py
leg vitl_int8_acc 2400 env BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=4 python tools/quant_accuracy.py
leg vith 2400 env BENCH_NO_WATCHDOG=1 BENCH_SAM=facebook/sam-vit-huge BENCH_SIZE=2048 BENCH_BATCH=2 python bench.py
leg vith_int8 2400 env BENCH_NO_WATCHDOG=1 BENCH_SAM=facebook/sam-vit-huge BENCH_SIZE=2048 BENCH_BATCH=2 BENCH_QUANT=int8 python bench.py
leg vitb_int8 2400 env BENCH_NO_WATCHDOG=1 BENCH_QUANT=int8 python bench.py
echo "=== queue_r4d done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r4d.done
