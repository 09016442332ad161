#!/bin/bash
# Round-4 queue b (after r4a): validate the startup fixes end-to-end.
#  1. driver_exact: python bench.py EXACTLY as the driver runs it
#     (watchdog, default budget 200 s) — success = live result, no
#     "fallback" key. Cache is warm from r4a's e2e leg (same code).
#  2-4. three spaced BENCH_E2E legs: healthy-relay warm band for the
#     honest disk-to-CSV number + cpu_util + stage attribution.
#  5. entry() cached-check from a fresh process (cross-process hit).
# Rules: one client at a time, 120 s spacing everywhere.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r4b.log

echo "=== queue_r4b start $(date) ===" >> "$LOG"
until timeout 600 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 180
done
echo "RELAY OK $(date)" >> "$LOG"
sleep 120

leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}

leg driver_exact 400 python bench.py
leg e2e_1 1200 env BENCH_NO_WATCHDOG=1 BENCH_E2E=1 python bench.py
leg e2e_2 1200 env BENCH_NO_WATCHDOG=1 BENCH_E2E=1 python bench.py
leg e2e_3 1200 env BENCH_NO_WATCHDOG=1 BENCH_E2E=1 python bench.py
echo "--- leg entry_cached start $(date) ---" >> "$LOG"
timeout 1200 python - >> "$LOG" 2>&1 <<'EOF'
import time
t0 = time.time()
import jax
import __graft_entry__ as g
fn, args = g.entry()
jax.jit(fn).lower(*args).compile()
print("entry cached-check ok", round(time.time() - t0, 1), "s")
EOF
echo "leg entry_cached rc=$? $(date)" >> "$LOG"
echo "=== queue_r4b done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r4b.done
