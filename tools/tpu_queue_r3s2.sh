#!/bin/bash
# Round-3 session-11 queue s2: rerun of the /verify CLI legs after the r3s
# leg-1 timeout kill (1-vCPU host was starved by a concurrent pytest run;
# timeouts now 1800 and NOTHING else runs on the host). Chains into r3t.
# Start: cd <repo> && nohup bash tools/tpu_queue_r3s2.sh > /tmp/tpu_queue_r3s2.log 2>&1 & echo $! > /tmp/tpu_queue_r3s2.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3s2.log

echo "=== queue_r3s2 start $(date) ===" >> "$LOG"
until timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 90
done
echo "RELAY OK $(date)" >> "$LOG"
sleep 120

echo "--- leg single_batch_inference start $(date) ---" >> "$LOG"
timeout 1800 python -m yolo_sam_inference_tpu.apps.single_batch_inference \
  --input-dir /tmp/fx/flat --output-dir /tmp/fx/out --batch-size 4 \
  --save-visualizations >> "$LOG" 2>&1
echo "leg single_batch rc=$? $(date)" >> "$LOG"
sleep 120

echo "--- leg project_inference start $(date) ---" >> "$LOG"
timeout 1800 python -m yolo_sam_inference_tpu.apps.project_inference \
  --project-dir /tmp/fx/project --output-dir /tmp/fx/outp --batch-size 4 \
  --roi 20,80 >> "$LOG" 2>&1
echo "leg project rc=$? $(date)" >> "$LOG"
sleep 120

echo "--- leg bench_small start $(date) ---" >> "$LOG"
BENCH_NO_WATCHDOG=1 BENCH_BATCH=4 BENCH_ITERS=5 timeout 1800 python bench.py >> "$LOG" 2>&1
echo "leg bench_small rc=$? $(date)" >> "$LOG"

echo "--- error paths (no device expected) $(date) ---" >> "$LOG"
python -m yolo_sam_inference_tpu.apps.single_batch_inference \
  --input-dir /tmp/fx/does-not-exist --output-dir /tmp/fx/oerr >> "$LOG" 2>&1
echo "err missing-input rc=$? (want != 0) $(date)" >> "$LOG"
python -m yolo_sam_inference_tpu.apps.project_inference \
  --project-dir /tmp/fx/project --output-dir /tmp/fx/oerr2 --roi banana >> "$LOG" 2>&1
echo "err bad-roi rc=$? (want != 0) $(date)" >> "$LOG"

echo "=== queue_r3s2 done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3s2.done

# chain the measurement queue (it has its own relay-wait loop)
bash tools/tpu_queue_r3t.sh
