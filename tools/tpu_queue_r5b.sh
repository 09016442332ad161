#!/bin/bash
# Round-5 queue b: chained flash-kernel sweeps (waits for r5a's sentinel).
# r5a established: the flash custom-calls run at 4.02 (windowed) / 5.91
# (global) ms IN-PROGRAM vs FLOP floors of 1.44 / 3.40 — and the r4
# "isolated" numbers were loop-hoisting artifacts. chain_bench.py
# reproduces in-program conditions cheaply; these legs sweep the tile
# knobs against that honest objective. Working theory: per-step VMEM
# (~7 MB live + double-buffering + wproj at wps=2) breaks DMA/compute
# overlap — smaller blocks should disproportionately help if so.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5b.log
echo "=== queue_r5b waiting for r5a $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5a.done ]; do sleep 60; done
echo "=== queue_r5b start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg chain_default 1800 python tools/chain_bench.py /tmp/prof_chain1
leg chain_wps1   1800 env SAM_FLASH_WPSB=1 python tools/chain_bench.py /tmp/prof_chain2
leg chain_qq128  1800 env SAM_FLASH_QQ=128 python tools/chain_bench.py /tmp/prof_chain3
leg chain_kq512  1800 env SAM_FLASH_KQ=512 python tools/chain_bench.py /tmp/prof_chain4
echo "=== queue_r5b done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5b.done
