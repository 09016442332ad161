#!/bin/bash
# Round-5 queue h (waits for r5g): config-2 encoder harness baseline.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5h.log
echo "=== queue_r5h waiting for r5g $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5g.done ]; do sleep 60; done
echo "=== queue_r5h start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg c2enc_default 2400 python tools/c2_encoder_bench.py /tmp/prof_c2e1
echo "=== queue_r5h done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5h.done
