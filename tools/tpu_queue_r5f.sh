#!/bin/bash
# Round-5 queue f (waits for r5e): softmax-structure variants of the
# windowed/global flash kernel, chained. vsum rides the softmax
# denominator on the PV matmul (exact numerics, parity-tested); nomax
# drops the row-max subtract (measurement — exp-overflow-unsafe beyond
# ~88 logits). Both target the VPU cross-lane reductions the r5e
# ablations bound.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5f.log
echo "=== queue_r5f waiting for r5e $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5e.done ]; do sleep 60; done
echo "=== queue_r5f start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg chain_vsum   1800 env SAM_FLASH_VSUM=1 python tools/chain_bench.py /tmp/prof_v1
leg chain_nomax  1800 env SAM_FLASH_NOMAX=1 python tools/chain_bench.py /tmp/prof_v2
leg chain_vs_nm  1800 env SAM_FLASH_VSUM=1 SAM_FLASH_NOMAX=1 python tools/chain_bench.py /tmp/prof_v3
echo "=== queue_r5f done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5f.done
