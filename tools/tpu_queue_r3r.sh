#!/bin/bash
# Round-3 session-10 queue r: close-out on the new CONV2D_FUSED=dot default.
#  1. default bench (dot program — B=128 HLO already cached by r3q leg 1):
#     refreshes .bench_last.json + the persistent cache on the shipping
#     default.
#  2. entry() compile warm (B=1 fused program under dot — a different cache
#     entry than the bench's B=128; the default flip left it cold).
#  3. entry() cached-check in a second fresh process.
# Generous timeouts ON PURPOSE: killing a mid-compile client wedges the
# relay (observed twice in round 3).
# Start: cd <repo> && nohup bash tools/tpu_queue_r3r.sh > /tmp/tpu_queue_r3r.log 2>&1 & echo $! > /tmp/tpu_queue_r3r.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3r.log

echo "=== queue_r3r start $(date) ===" >> "$LOG"
until timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 90
done
echo "RELAY OK $(date)" >> "$LOG"

echo "--- leg default_dot_refresh start $(date) ---" >> "$LOG"
BENCH_NO_WATCHDOG=1 timeout 1800 python bench.py >> "$LOG" 2>&1
echo "leg default_dot_refresh rc=$? $(date)" >> "$LOG"
sleep 120

echo "--- entry() compile warm start $(date) ---" >> "$LOG"
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
jax.block_until_ready(out)
print("entry execute ok", round(time.time() - t1, 1), "s")
EOF
echo "entry warm rc=$? $(date)" >> "$LOG"
sleep 120

echo "--- entry() cached-check start $(date) ---" >> "$LOG"
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

echo "=== queue_r3r done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3r.done
