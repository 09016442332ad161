#!/bin/bash
# Round-3 session-7 queue i: (1) pre-rework-kernel parity baseline from the
# old-tree worktree (same A-S erf, same tolerances — if the error
# magnitudes match the new tree's, the clamped-halo rework is numerically
# transparent and the FAILs are Mosaic fp32-dot precision, not plumbing),
# (2) new-tree parity with SAM_ERF_AS=1 for the direct comparison,
# (3) micro mbconv incl. the pl.reciprocal fast-recip gelu variant,
# (4) config-1 ViT-B default bench with the rational erf (new default
# program -> re-warms the persistent compile cache for the driver).
# Start: cd <repo> && nohup bash tools/tpu_queue_r3i.sh > /tmp/tpu_queue_r3i.log 2>&1 & echo $! > /tmp/tpu_queue_r3i.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3i.log

echo "=== queue_r3i start $(date) ===" >> "$LOG"
until timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 90
done
echo "RELAY OK $(date)" >> "$LOG"

echo "--- old-tree parity baseline $(date) ---" >> "$LOG"
(cd /tmp/oldtree && timeout 1200 python tools/device_parity_tv.py) \
  > /tmp/parity_tv_old.txt 2>>"$LOG"
echo "old parity rc=$? $(date)" >> "$LOG"

echo "--- new-tree parity, SAM_ERF_AS=1 $(date) ---" >> "$LOG"
SAM_ERF_AS=1 timeout 1200 python tools/device_parity_tv.py \
  > /tmp/parity_tv_as.txt 2>>"$LOG"
echo "new parity rc=$? $(date)" >> "$LOG"

echo "--- micro mbconv (with fast recip) $(date) ---" >> "$LOG"
timeout 1800 python tools/micro_ln_mlp.py mbconv > /tmp/micro_mbconv2.txt 2>>"$LOG"
echo "micro rc=$? $(date)" >> "$LOG"

echo "--- config-1 ViT-B default bench (rational erf) $(date) ---" >> "$LOG"
BENCH_NO_WATCHDOG=1 timeout 2400 python bench.py > /tmp/bench_vitb_rat.json 2>>"$LOG"
echo "bench vitb rc=$? $(date)" >> "$LOG"

echo "=== queue_r3i done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3i.done
