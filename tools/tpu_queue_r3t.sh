#!/bin/bash
# Round-3 session-11 queue t:
#  1. fresh config-1 (ViT-B B=128) attribution trace on the final tree —
#     locate the remaining fusion-tail buckets behind the 525.6 headline.
#  2. entry() compile warm with the params-as-arguments signature (module
#     560 KB instead of 373 MB) + a fresh-process cached-check that counts
#     jit_forward cache entries: does the persistent cache hit cross-process
#     on axon at all?
#  3. int8 accuracy probe (tools/quant_accuracy.py): YOLO path identical by
#     construction, so the table isolates the encoder-quant drift.
#  4. config-2 A/B: BENCH_TV_S2D=1 under the new CONV2D_FUSED=dot default
#     (r3p only measured it under the all-Pallas pass). Control: 787.95.
# Start: cd <repo> && nohup bash tools/tpu_queue_r3t.sh > /tmp/tpu_queue_r3t.log 2>&1 & echo $! > /tmp/tpu_queue_r3t.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3t.log

echo "=== queue_r3t start $(date) ===" >> "$LOG"
until timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 90
done
echo "RELAY OK $(date)" >> "$LOG"

echo "--- leg trace_c1 start $(date) ---" >> "$LOG"
BENCH_BATCH=128 timeout 1800 \
  python tools/profile_bench.py /tmp/prof_c1 > /tmp/prof_c1.txt 2>>"$LOG"
echo "trace_c1 rc=$? $(date)" >> "$LOG"
timeout 300 python tools/attribute_trace.py /tmp/prof_c1 /tmp/fused_hlo.txt \
  > /tmp/attr_c1.txt 2>>"$LOG"
echo "attr_c1 rc=$? $(date)" >> "$LOG"
sleep 120

echo "--- leg entry_warm (params-as-args) start $(date) ---" >> "$LOG"
# drop the stale 604 MB closure-era entry() executables (different HLO now)
rm -f /root/.cache/jax_comp/jit_forward-*
ls /root/.cache/jax_comp | grep -c jit_forward >> "$LOG" 2>&1
timeout 1500 python - >> "$LOG" 2>&1 <<'EOF'
import time
t0 = time.time()
import jax
import __graft_entry__ as g
fn, args = g.entry()
c = jax.jit(fn).lower(*args).compile()
print("entry compile ok", round(time.time() - t0, 1), "s")
t1 = time.time()
out = c(*args)
import numpy as np
np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
print("entry execute ok", round(time.time() - t1, 1), "s")
EOF
echo "entry warm rc=$? $(date)" >> "$LOG"
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

echo "=== queue_r3t done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3t.done
