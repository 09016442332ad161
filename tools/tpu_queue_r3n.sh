#!/bin/bash
# Round-3 session-10 queue n: verify-skill device legs (CLI happy paths +
# small bench) behind a relay-recovery wait. One TPU client at a time;
# generous timeouts (killing a mid-compile client wedges the relay).
# Start: cd <repo> && nohup bash tools/tpu_queue_r3n.sh > /tmp/tpu_queue_r3n.log 2>&1 & echo $! > /tmp/tpu_queue_r3n.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3n.log

echo "=== queue_r3n start $(date) ===" >> "$LOG"
until timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 90
done
echo "RELAY OK $(date)" >> "$LOG"

echo "--- single_batch_inference start $(date) ---" >> "$LOG"
timeout 900 python -m yolo_sam_inference_tpu.apps.single_batch_inference \
  --input-dir /tmp/fx/flat --output-dir /tmp/fx/out --batch-size 4 \
  --save-visualizations >> "$LOG" 2>&1
echo "single_batch rc=$? $(date)" >> "$LOG"
sleep 60

echo "--- project_inference start $(date) ---" >> "$LOG"
timeout 900 python -m yolo_sam_inference_tpu.apps.project_inference \
  --project-dir /tmp/fx/project --output-dir /tmp/fx/outp --batch-size 4 \
  --roi 20,80 >> "$LOG" 2>&1
echo "project rc=$? $(date)" >> "$LOG"
sleep 60

echo "--- small bench start $(date) ---" >> "$LOG"
BENCH_BATCH=4 BENCH_ITERS=5 BENCH_NO_WATCHDOG=1 timeout 900 python bench.py >> "$LOG" 2>&1
echo "bench rc=$? $(date)" >> "$LOG"

echo "=== queue_r3n done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3n.done
