#!/bin/bash
# Round-5 FINAL insurance (waits for r5x): driver-exact bench on the
# frozen tree (refreshes .bench_last.json + warms the exact persistent
# cache entries the driver compiles), then the entry() check.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5y.log
until [ -f /tmp/tpu_queue_r5x.done ]; do sleep 30; done
echo "=== queue_r5y start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg driver_exact 2400 python bench.py
leg entry_check 1800 python -c "import __graft_entry__ as g, jax, time; t0=time.time(); fn, args = g.entry(); r = jax.jit(fn)(*args); jax.tree_util.tree_leaves(r)[0].block_until_ready(); print('entry ok in', round(time.time()-t0,1), 's')"
echo "=== queue_r5y done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5y.done
