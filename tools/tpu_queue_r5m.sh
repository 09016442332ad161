#!/bin/bash
# Round-5 queue m (waits for r5l): re-sweep the TinyViT pack cap on the
# builder the 512^2 path actually uses (r5k hit a no-op: only the
# non-cells builder read the knob).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5m.log
echo "=== queue_r5m waiting for r5l $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5l.done ]; do sleep 60; done
echo "=== queue_r5m start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg c2enc_cells448 2400 env SAM_TV_PACKCAP=448 python tools/c2_encoder_bench.py /tmp/prof_c2e4
leg c2enc_cells800 2400 env SAM_TV_PACKCAP=800 python tools/c2_encoder_bench.py /tmp/prof_c2e5
echo "=== queue_r5m done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5m.done
