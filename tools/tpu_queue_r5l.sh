#!/bin/bash
# Round-5 queue l (waits for r5k): stack the winners. r5i/r5j measured
# wpair+vsum windowed 3.317 (-0.70) and vmem64+QQ512 global 5.484
# (-0.43); these legs combine them and probe further (bqy=32 global
# under 96M vmem; constant-M exp shift instead of the row max).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5l.log
echo "=== queue_r5l waiting for r5k $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5k.done ]; do sleep 60; done
echo "=== queue_r5l start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg combo_base 1800 env SAM_FLASH_WPAIR=1 SAM_FLASH_VSUM=1 SAM_FLASH_VMEM=67108864 SAM_FLASH_QQ=512 python tools/chain_bench.py /tmp/prof_cb1
leg combo_qq1k 1800 env SAM_FLASH_WPAIR=1 SAM_FLASH_VSUM=1 SAM_FLASH_VMEM=100663296 SAM_FLASH_QQ=1024 python tools/chain_bench.py /tmp/prof_cb2
leg combo_nomax 1800 env SAM_FLASH_WPAIR=1 SAM_FLASH_VSUM=1 SAM_FLASH_NOMAX=1 SAM_FLASH_VMEM=67108864 SAM_FLASH_QQ=512 python tools/chain_bench.py /tmp/prof_cb3
echo "=== queue_r5l done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5l.done
