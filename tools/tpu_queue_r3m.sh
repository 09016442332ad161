#!/bin/bash
# Round-3 session-9 queue m: warm the persistent compile cache for the
# driver's entry() compile check (B=1 fused program — a different cache
# entry than the bench's B=128; the final kernel commits left it cold).
# The timeout is generous ON PURPOSE: killing a mid-compile client wedges
# the relay (observed twice).
# Start: cd <repo> && nohup bash tools/tpu_queue_r3m.sh > /tmp/tpu_queue_r3m.log 2>&1 & echo $! > /tmp/tpu_queue_r3m.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3m.log

echo "=== queue_r3m start $(date) ===" >> "$LOG"
until timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 90
done
echo "RELAY OK $(date)" >> "$LOG"

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

# second fresh process: confirm the cache hit makes the check fast
sleep 60
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

echo "=== queue_r3m done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3m.done
