#!/bin/bash
# Round-3 session-6 follow-up: fresh config-2 (MobileSAM B=128) attribution
# trace — the session-5 note quoted ~116 ms of buckets against a 193 ms
# iteration; this locates the remaining ~77 ms tail. One TPU client at a
# time (tpu-relay discipline): sanity matmul first, then the profile run.
# Start: cd <repo> && nohup bash tools/tpu_queue_r3f.sh > /tmp/tpu_queue_r3f.log 2>&1 & echo $! > /tmp/tpu_queue_r3f.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3f.log

echo "=== queue_r3f start $(date) ===" >> "$LOG"
# relay sanity: a 90s-bounded matmul; retry until the relay answers
until timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 90
done
echo "RELAY OK $(date)" >> "$LOG"

echo "--- profile mobilesam B=128 start $(date) ---" >> "$LOG"
BENCH_SAM=mobile-sam BENCH_BATCH=128 timeout 1800 \
  python tools/profile_bench.py /tmp/prof_ms > /tmp/prof_ms.txt 2>>"$LOG"
timeout 300 python tools/attribute_trace.py /tmp/prof_ms /tmp/fused_hlo.txt \
  > /tmp/attr_ms.txt 2>>"$LOG"
echo "--- profile mobilesam done $(date) ---" >> "$LOG"

echo "=== queue_r3f done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3f.done
