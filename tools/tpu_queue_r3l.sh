#!/bin/bash
# Round-3 session-9 queue l: fresh MobileSAM B=128 attribution trace on the
# FINAL tree. The r3f-era trace attributed an 8.4 ms source-less 'copy'
# bucket to paired batch-minor <-> standard layout conversions around the
# Mosaic kernel boundaries, anchored (hypothesis) by stage-3's XLA grouped
# conv — which the s1-merge kernel (c1f6a10) has since removed. This trace
# confirms whether the bucket is gone and what the next-largest target is.
# Start: cd <repo> && nohup bash tools/tpu_queue_r3l.sh > /tmp/tpu_queue_r3l.log 2>&1 & echo $! > /tmp/tpu_queue_r3l.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3l.log

echo "=== queue_r3l start $(date) ===" >> "$LOG"
until timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 90
done
echo "RELAY OK $(date)" >> "$LOG"

echo "--- profile mobilesam B=128 (final tree) start $(date) ---" >> "$LOG"
BENCH_SAM=mobile-sam BENCH_BATCH=128 timeout 1800 \
  python tools/profile_bench.py /tmp/prof_ms3 > /tmp/prof_ms3.txt 2>>"$LOG"
echo "profile rc=$? $(date)" >> "$LOG"
timeout 300 python tools/attribute_trace.py /tmp/prof_ms3 /tmp/fused_hlo.txt \
  > /tmp/attr_ms3.txt 2>>"$LOG"
echo "attr rc=$? $(date)" >> "$LOG"

echo "=== queue_r3l done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3l.done
