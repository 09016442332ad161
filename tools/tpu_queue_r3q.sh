#!/bin/bash
# Round-3 session-10 queue q: CONV2D_FUSED=dot A/B (1x1 convs as dots, dense
# convs on XLA — the middle ground r3p did not measure). Controls are the
# r3p ctrl legs on the identical tree: cfg1 524.32, cfg2 781.60.
#  1. config 1 (ViT-B 512 B=128)  CONV2D_FUSED=dot
#  2. config 2 (MobileSAM B=128)  CONV2D_FUSED=dot
#  3. default refresh (CONV2D_FUSED unset -> "0"): re-warms the persistent
#     cache + .bench_last.json on the shipping default program.
# 120 s spacing between process exits (relay-stall avoidance).
# Start: cd <repo> && nohup bash tools/tpu_queue_r3q.sh > /tmp/tpu_queue_r3q.log 2>&1 & echo $! > /tmp/tpu_queue_r3q.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3q.log

wait_relay() {
  until timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
    echo "relay still down $(date)" >> "$LOG"
    sleep 90
  done
  echo "RELAY OK $(date)" >> "$LOG"
}

leg() {  # leg <name> <timeout> <env...>
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  env "$@" BENCH_NO_WATCHDOG=1 timeout "$tmo" python bench.py >> "$LOG" 2>&1
  echo "leg $name rc=$? $(date)" >> "$LOG"
  sleep 120
}

echo "=== queue_r3q start $(date) ===" >> "$LOG"
wait_relay
leg cfg1_dot 1800 CONV2D_FUSED=dot
leg cfg2_dot 1800 BENCH_SAM=mobile-sam CONV2D_FUSED=dot
leg default_refresh 1800

echo "=== queue_r3q done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3q.done
