#!/bin/bash
# Round-5 queue e (waits for r5d): ablation decomposition of the windowed
# flash step. r5b/r5c showed every tile direction neutral-or-worse, so
# the 2.8x-over-floor cost is inside the step: these legs null out one
# term each (exp / bias-augment / PV dot / QK dot) and chain_bench reads
# the delta. Numerics are wrong by construction — measurement only.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5e.log
echo "=== queue_r5e waiting for r5d $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5d.done ]; do sleep 60; done
echo "=== queue_r5e start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg abl_noexp  1800 env SAM_FLASH_ABL=noexp  python tools/chain_bench.py /tmp/prof_abl1
leg abl_nobias 1800 env SAM_FLASH_ABL=nobias python tools/chain_bench.py /tmp/prof_abl2
leg abl_nopv   1800 env SAM_FLASH_ABL=nopv   python tools/chain_bench.py /tmp/prof_abl3
leg abl_noqk   1800 env SAM_FLASH_ABL=noqk   python tools/chain_bench.py /tmp/prof_abl4
echo "=== queue_r5e done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5e.done
