#!/bin/bash
# Round-4 queue c: serving bench on device + driver-exact revalidation.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r4c.log
echo "=== queue_r4c start $(date) ===" >> "$LOG"
until timeout 600 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"; sleep 180
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
leg serve_bench 1800 python tools/serve_bench.py --batch 128 --inflight 256 --requests 2048
leg driver_exact 400 python bench.py
echo "=== queue_r4c done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r4c.done
