#!/bin/bash
# Round-3 session-12 queue u: the host wipe cleared /tmp (queue r3s2/r3t
# never ran) AND /root/.cache/jax_comp (the persistent compile cache the
# round-close insurance depends on). Re-run everything lost, cache warm
# first:
#  1. default bench (re-warms the driver's program cache + refreshes
#     .bench_last.json with a live number)
#  2. entry() compile warm (the driver's single-chip compile-check)
#  3. /verify CLI legs: single_batch_inference, project_inference,
#     small bench, error paths
#  4. fresh config-1 (ViT-B B=128) attribution trace on the final tree
#  5. entry() cached-check from a fresh process (does the persistent
#     cache hit cross-process on axon?)
#  6. int8 accuracy probe (tools/quant_accuracy.py)
#  7. config-2 A/B: BENCH_TV_S2D=1 under the CONV2D_FUSED=dot default
#     (control 787.95)
# Sequential, 120 s spacing (one TPU client at a time; killing a
# mid-compile client wedges the relay; the 1-vCPU host must not run
# anything else heavy concurrently).
# Start: cd <repo> && nohup bash tools/tpu_queue_r3u.sh > /tmp/tpu_queue_r3u.log 2>&1 & echo $! > /tmp/tpu_queue_r3u.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3u.log

echo "=== queue_r3u start $(date) ===" >> "$LOG"
# Probe timeout must be generous: a recovering relay can take ~5 min to
# serve a fresh client, and a short timeout that kills the mid-init client
# WEDGES it further (observed 2026-08-20: three 90 s probe kills -> two
# ~5 min client attaches before recovery).
until timeout 600 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 180
done
echo "RELAY OK $(date)" >> "$LOG"

echo "--- leg warm_default start $(date) ---" >> "$LOG"
BENCH_NO_WATCHDOG=1 BENCH_PHASES=1 timeout 1800 python bench.py >> "$LOG" 2>&1
echo "leg warm_default rc=$? $(date)" >> "$LOG"
sleep 120

echo "--- leg entry_warm start $(date) ---" >> "$LOG"
timeout 1800 python - >> "$LOG" 2>&1 <<'EOF'
import time
t0 = time.time()
import jax
import __graft_entry__ as g
fn, args = g.entry()
jax.jit(fn).lower(*args).compile()
print("entry compile ok", round(time.time() - t0, 1), "s")
EOF
echo "leg entry_warm rc=$? $(date)" >> "$LOG"
sleep 120

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
sleep 120

echo "--- leg hlo_dump_c1 start $(date) ---" >> "$LOG"
BENCH_BATCH=128 timeout 1800 python tools/dump_hlo.py >> "$LOG" 2>&1
echo "hlo_dump_c1 rc=$? $(date)" >> "$LOG"
sleep 120

echo "--- leg trace_c1 start $(date) ---" >> "$LOG"
BENCH_BATCH=128 timeout 1800 \
  python tools/profile_bench.py /tmp/prof_c1 > /tmp/prof_c1.txt 2>>"$LOG"
echo "trace_c1 rc=$? $(date)" >> "$LOG"
timeout 300 python tools/attribute_trace.py /tmp/prof_c1 /tmp/fused_hlo.txt \
  > /tmp/attr_c1.txt 2>>"$LOG"
echo "attr_c1 rc=$? $(date)" >> "$LOG"
sleep 120

echo "--- leg entry_cached_check start $(date) ---" >> "$LOG"
echo "jit_forward entries before: $(ls /root/.cache/jax_comp | grep -c jit_forward)" >> "$LOG"
timeout 1500 python - >> "$LOG" 2>&1 <<'EOF'
import time
t0 = time.time()
import jax
import __graft_entry__ as g
fn, args = g.entry()
jax.jit(fn).lower(*args).compile()
print("entry cached compile ok", round(time.time() - t0, 1), "s")
EOF
echo "entry cached rc=$? $(date)" >> "$LOG"
echo "jit_forward entries after: $(ls /root/.cache/jax_comp | grep -c jit_forward)" >> "$LOG"
sleep 120

echo "--- leg quant_accuracy start $(date) ---" >> "$LOG"
timeout 1800 python tools/quant_accuracy.py >> "$LOG" 2>&1
echo "quant_accuracy rc=$? $(date)" >> "$LOG"
sleep 120

echo "--- leg ms_tv_s2d_dot start $(date) ---" >> "$LOG"
BENCH_NO_WATCHDOG=1 BENCH_SAM=mobile-sam BENCH_TV_S2D=1 timeout 1800 \
  python bench.py >> "$LOG" 2>&1
echo "ms_tv_s2d_dot rc=$? $(date)" >> "$LOG"

echo "=== queue_r3u done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3u.done
