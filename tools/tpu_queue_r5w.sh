#!/bin/bash
# Round-5 queue w (waits for r5u): fused_ln_matmul block_rows sweep —
# the 32.4 ms qkv-projection bucket's tile was never swept (87% of
# floor; up to -4 ms/iter if a better block exists).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5w.log
echo "=== queue_r5w waiting for r5u $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5u.done ]; do sleep 60; done
echo "=== queue_r5w start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg chain_br128 1800 env SAM_LNMM_BR=128 python tools/chain_bench.py /tmp/prof_br1
leg chain_br512 1800 env SAM_LNMM_BR=512 python tools/chain_bench.py /tmp/prof_br2
echo "=== queue_r5w done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5w.done
