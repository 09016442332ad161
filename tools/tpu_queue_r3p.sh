#!/bin/bash
# Round-3 session-10 queue p: conv2d_fused A/B at the bench configs.
#  1. config 1 (ViT-B 512 B=128) new default        vs  2. CONV2D_FUSED=0
#  3. config 2 (MobileSAM B=128) new default        vs  4. CONV2D_FUSED=0
#  5. config 2 + BENCH_TV_S2D=1 (s2d stems now run as Pallas convs)
#  6. config 2 + TINYVIT_FUSED_MERGE_MIN_H=64 (merge1 through the merge
#     kernel now that the other conv layout anchors are gone)
#  7. config 2 trace for the new default (relayout-copy bucket verdict)
# 120 s spacing between process exits (relay-stall avoidance).
# Start: cd <repo> && nohup bash tools/tpu_queue_r3p.sh > /tmp/tpu_queue_r3p.log 2>&1 & echo $! > /tmp/tpu_queue_r3p.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3p.log

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

echo "=== queue_r3p start $(date) ===" >> "$LOG"
wait_relay
leg cfg1_new 1800
leg cfg1_ctrl 1800 CONV2D_FUSED=0
leg cfg2_new 1800 BENCH_SAM=mobile-sam
leg cfg2_ctrl 1800 BENCH_SAM=mobile-sam CONV2D_FUSED=0
leg cfg2_s2dstem 1800 BENCH_SAM=mobile-sam BENCH_TV_S2D=1
leg cfg2_merge64 1800 BENCH_SAM=mobile-sam TINYVIT_FUSED_MERGE_MIN_H=64

echo "--- trace cfg2_new start $(date) ---" >> "$LOG"
BENCH_SAM=mobile-sam BENCH_BATCH=128 timeout 1800 \
  python tools/dump_hlo.py >> "$LOG" 2>&1
echo "dump_hlo rc=$? $(date)" >> "$LOG"
sleep 120
BENCH_SAM=mobile-sam BENCH_BATCH=128 timeout 1800 \
  python tools/profile_bench.py /tmp/prof_ms4 > /tmp/prof_ms4.txt 2>>"$LOG"
echo "profile rc=$? $(date)" >> "$LOG"
timeout 300 python tools/attribute_trace.py /tmp/prof_ms4 /tmp/fused_hlo.txt \
  > /tmp/attr_ms4.txt 2>>"$LOG"
echo "attr rc=$? $(date)" >> "$LOG"

echo "=== queue_r3p done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3p.done
