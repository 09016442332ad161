#!/bin/bash
# Round-3 session-8 queue k: (1) clean spaced e2e re-measure (queue-j's two
# e2e legs were relay anomalies: 9.85 s fetch congestion / 414 s sample-sync
# stall right after a process exit — so every leg here sleeps 120 s after
# the previous process exits), (2) BASELINE ladder refresh on the FINAL
# tree (ViT-L / ViT-H / int8 legs — the rational-erf + fast-recip + halo
# rework changes benefit every SAM encoder, but the standing table numbers
# predate them), (3) final default refresh so the persistent compile cache
# and .bench_last.json end on the current default program.
# Start: cd <repo> && nohup bash tools/tpu_queue_r3k.sh > /tmp/tpu_queue_r3k.log 2>&1 & echo $! > /tmp/tpu_queue_r3k.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3k.log

echo "=== queue_r3k start $(date) ===" >> "$LOG"
until timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 90
done
echo "RELAY OK $(date)" >> "$LOG"

run() { # run NAME [ENV=V ...]
  local name=$1; shift
  echo "--- $name $(date) ---" >> "$LOG"
  env "$@" BENCH_NO_WATCHDOG=1 timeout 2400 python bench.py \
    > "/tmp/bench_r3k_${name}.json" 2>>"$LOG"
  echo "$name rc=$? $(date)" >> "$LOG"
  sleep 120
}

run e2e_1 BENCH_E2E=1
run e2e_2 BENCH_E2E=1
run e2e_3 BENCH_E2E=1
run vitl BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=32
run vitl_int8 BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=32 BENCH_QUANT=int8
run vith2048 BENCH_SAM=facebook/sam-vit-huge BENCH_SIZE=2048 BENCH_BATCH=2
run vith2048_int8 BENCH_SAM=facebook/sam-vit-huge BENCH_SIZE=2048 BENCH_BATCH=2 BENCH_QUANT=int8
run vitb_int8 BENCH_QUANT=int8
run default_refresh

echo "=== queue_r3k done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3k.done
