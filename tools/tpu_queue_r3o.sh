#!/bin/bash
# Round-3 session-10 queue o: conv2d_fused device bring-up.
#  leg 1: standalone kernel lowering+parity microtest (seconds per case)
#  leg 2: verify-CLI project leg rerun (r3n ran it against a mid-edit tree)
#  leg 3: small-batch bench compile check for both configs
# Aborts after leg 1 failures. One TPU client at a time; generous timeouts.
# Start: cd <repo> && nohup bash tools/tpu_queue_r3o.sh > /tmp/tpu_queue_r3o.log 2>&1 & echo $! > /tmp/tpu_queue_r3o.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3o.log

echo "=== queue_r3o start $(date) ===" >> "$LOG"
until timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 90
done
echo "RELAY OK $(date)" >> "$LOG"

echo "--- conv2d device check start $(date) ---" >> "$LOG"
timeout 1200 python tools/device_check_conv2d.py >> "$LOG" 2>&1
RC1=$?
echo "conv2d check rc=$RC1 $(date)" >> "$LOG"
if [ $RC1 -ne 0 ]; then
  echo "=== queue_r3o ABORT after leg 1 $(date) ===" >> "$LOG"
  touch /tmp/tpu_queue_r3o.done
  exit 1
fi
sleep 60

echo "--- project_inference rerun start $(date) ---" >> "$LOG"
timeout 900 python -m yolo_sam_inference_tpu.apps.project_inference \
  --project-dir /tmp/fx/project --output-dir /tmp/fx/outp2 --batch-size 4 \
  --roi 20,80 >> "$LOG" 2>&1
echo "project rc=$? $(date)" >> "$LOG"
sleep 60

echo "--- small bench config1 start $(date) ---" >> "$LOG"
BENCH_BATCH=8 BENCH_ITERS=3 BENCH_NO_WATCHDOG=1 timeout 1200 python bench.py >> "$LOG" 2>&1
echo "bench1 rc=$? $(date)" >> "$LOG"
sleep 60

echo "--- small bench mobilesam start $(date) ---" >> "$LOG"
BENCH_SAM=mobile-sam BENCH_BATCH=8 BENCH_ITERS=3 BENCH_NO_WATCHDOG=1 timeout 1200 python bench.py >> "$LOG" 2>&1
echo "bench2 rc=$? $(date)" >> "$LOG"

echo "=== queue_r3o done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3o.done
