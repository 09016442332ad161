#!/bin/bash
# Round-3 session-7 queue: validate + A/B the unpadded-input clamped-halo
# rework of the three TinyViT strip kernels (dw_ln_mlp / mbconv_fused /
# merge_fused — drops the full-tensor jnp.pad+lax.slice HBM staging,
# ~12 ms of the 193 ms MobileSAM B=128 iteration per the r3f trace).
# One TPU client at a time (tpu-relay discipline): sanity matmul first.
# Start: cd <repo> && nohup bash tools/tpu_queue_r3g.sh > /tmp/tpu_queue_r3g.log 2>&1 & echo $! > /tmp/tpu_queue_r3g.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3g.log

echo "=== queue_r3g start $(date) ===" >> "$LOG"
until timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 90
done
echo "RELAY OK $(date)" >> "$LOG"

echo "--- device parity (Mosaic path) $(date) ---" >> "$LOG"
timeout 1200 python tools/device_parity_tv.py > /tmp/parity_tv.txt 2>>"$LOG"
echo "parity rc=$? $(date)" >> "$LOG"

echo "--- mobilesam B=128 bench $(date) ---" >> "$LOG"
BENCH_SAM=mobile-sam BENCH_BATCH=128 BENCH_NO_WATCHDOG=1 timeout 1800 \
  python bench.py > /tmp/bench_ms_r3g.json 2>>"$LOG"
echo "bench rc=$? $(date)" >> "$LOG"

echo "--- fresh mobilesam trace $(date) ---" >> "$LOG"
BENCH_SAM=mobile-sam BENCH_BATCH=128 timeout 1800 \
  python tools/profile_bench.py /tmp/prof_ms2 > /tmp/prof_ms2.txt 2>>"$LOG"
timeout 300 python tools/attribute_trace.py /tmp/prof_ms2 /tmp/fused_hlo.txt \
  > /tmp/attr_ms2.txt 2>>"$LOG"
echo "--- trace done $(date) ---" >> "$LOG"

echo "=== queue_r3g done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3g.done
