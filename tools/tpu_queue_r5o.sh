#!/bin/bash
# Round-5 queue o (waits for r5n): TinyViT pack sweep, attempt 3 — nwin
# at 512^2 is 10 (ws=7 stages) and 3 (ws=14), so the old (8,4,2)
# candidates never fired; now (10,8,6,5,4,3,2) + bias-cap/vmem knobs.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5o.log
echo "=== queue_r5o waiting for r5n $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5n.done ]; do sleep 60; done
echo "=== queue_r5o start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg c2enc_p448  2400 env SAM_TV_PACKCAP=448 python tools/c2_encoder_bench.py /tmp/prof_c2e6
leg c2enc_p800  2400 env SAM_TV_PACKCAP=800 SAM_TV_BIASCAP=12582912 SAM_TV_VMEM=67108864 python tools/c2_encoder_bench.py /tmp/prof_c2e7
echo "=== queue_r5o done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5o.done
