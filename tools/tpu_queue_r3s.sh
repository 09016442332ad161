#!/bin/bash
# Round-3 session-11 queue s: /verify skill drive — CLI happy paths on the
# real device + small-batch bench + error paths, sequential (one TPU client
# at a time; killing a mid-compile client wedges the relay).
# Start: cd <repo> && nohup bash tools/tpu_queue_r3s.sh > /tmp/tpu_queue_r3s.log 2>&1 & echo $! > /tmp/tpu_queue_r3s.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3s.log

echo "=== queue_r3s start $(date) ===" >> "$LOG"
until timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 90
done
echo "RELAY OK $(date)" >> "$LOG"

echo "--- fixtures (CPU) $(date) ---" >> "$LOG"
rm -rf /tmp/fx
python - >> "$LOG" 2>&1 <<'EOF'
import sys; sys.path.insert(0, 'tests')
from pathlib import Path
from synth import make_project_tree, make_cell_image
import numpy as np; from PIL import Image
make_project_tree(Path('/tmp/fx/project'), batches=2, images_per_batch=2)
flat = Path('/tmp/fx/flat'); flat.mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(0)
for i in range(4):
    Image.fromarray(make_cell_image(rng, 96, 128)).save(flat/f'i{i}.png')
print("fixtures ok")
EOF

echo "--- leg single_batch_inference start $(date) ---" >> "$LOG"
timeout 900 python -m yolo_sam_inference_tpu.apps.single_batch_inference \
  --input-dir /tmp/fx/flat --output-dir /tmp/fx/out --batch-size 4 \
  --save-visualizations >> "$LOG" 2>&1
echo "leg single_batch rc=$? $(date)" >> "$LOG"
sleep 60

echo "--- leg project_inference start $(date) ---" >> "$LOG"
timeout 900 python -m yolo_sam_inference_tpu.apps.project_inference \
  --project-dir /tmp/fx/project --output-dir /tmp/fx/outp --batch-size 4 \
  --roi 20,80 >> "$LOG" 2>&1
echo "leg project rc=$? $(date)" >> "$LOG"
sleep 60

echo "--- leg bench_small start $(date) ---" >> "$LOG"
BENCH_NO_WATCHDOG=1 BENCH_BATCH=4 BENCH_ITERS=5 timeout 900 python bench.py >> "$LOG" 2>&1
echo "leg bench_small rc=$? $(date)" >> "$LOG"

echo "--- error paths (no device expected) $(date) ---" >> "$LOG"
python -m yolo_sam_inference_tpu.apps.single_batch_inference \
  --input-dir /tmp/fx/does-not-exist --output-dir /tmp/fx/oerr >> "$LOG" 2>&1
echo "err missing-input rc=$? (want != 0) $(date)" >> "$LOG"
python -m yolo_sam_inference_tpu.apps.project_inference \
  --project-dir /tmp/fx/project --output-dir /tmp/fx/oerr2 --roi banana >> "$LOG" 2>&1
echo "err bad-roi rc=$? (want != 0) $(date)" >> "$LOG"

echo "=== queue_r3s done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3s.done
