#!/bin/bash
# Round-3 session-8 queue j: (1) verify-skill TPU happy-path CLI legs
# (single_batch_inference with visualizations + project_inference with ROI
# gating), (2) fast-recip erf A/B: config-1 default + MobileSAM benches
# (controls are the session-7 pre-recip runs of the otherwise-identical
# tree: 518.17 / 745.59), (3) honest e2e leg on the final tree (two warm
# runs). The default bench runs FIRST among device-heavy legs so the
# persistent compile cache + .bench_last.json always carry the current
# default program.
# Start: cd <repo> && nohup bash tools/tpu_queue_r3j.sh > /tmp/tpu_queue_r3j.log 2>&1 & echo $! > /tmp/tpu_queue_r3j.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3j.log

echo "=== queue_r3j start $(date) ===" >> "$LOG"
until timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 90
done
echo "RELAY OK $(date)" >> "$LOG"

echo "--- bench default (fast recip) $(date) ---" >> "$LOG"
BENCH_NO_WATCHDOG=1 timeout 2400 python bench.py > /tmp/bench_vitb_recip.json 2>>"$LOG"
echo "bench vitb rc=$? $(date)" >> "$LOG"

echo "--- bench mobilesam (fast recip) $(date) ---" >> "$LOG"
BENCH_SAM=mobile-sam BENCH_BATCH=128 BENCH_NO_WATCHDOG=1 timeout 1800 \
  python bench.py > /tmp/bench_ms_recip.json 2>>"$LOG"
echo "bench ms rc=$? $(date)" >> "$LOG"

echo "--- verify: single_batch_inference $(date) ---" >> "$LOG"
rm -rf /tmp/fx/out
timeout 900 python -m yolo_sam_inference_tpu.apps.single_batch_inference \
  --input-dir /tmp/fx/flat --output-dir /tmp/fx/out --batch-size 4 \
  --save-visualizations >> "$LOG" 2>&1
echo "verify flat rc=$? $(date)" >> "$LOG"

echo "--- verify: project_inference $(date) ---" >> "$LOG"
rm -rf /tmp/fx/outp
timeout 900 python -m yolo_sam_inference_tpu.apps.project_inference \
  --project-dir /tmp/fx/project --output-dir /tmp/fx/outp --batch-size 4 \
  --roi 20,80 >> "$LOG" 2>&1
echo "verify project rc=$? $(date)" >> "$LOG"

echo "--- e2e warm x2 $(date) ---" >> "$LOG"
BENCH_E2E=1 BENCH_NO_WATCHDOG=1 timeout 2400 python bench.py \
  > /tmp/bench_e2e_recip1.json 2>>"$LOG"
echo "e2e1 rc=$? $(date)" >> "$LOG"
BENCH_E2E=1 BENCH_NO_WATCHDOG=1 timeout 1200 python bench.py \
  > /tmp/bench_e2e_recip2.json 2>>"$LOG"
echo "e2e2 rc=$? $(date)" >> "$LOG"

echo "=== queue_r3j done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3j.done
