#!/bin/bash
# Round-5 queue c: second wave of chained flash sweeps (waits for r5b).
# chain_default reproduced the in-program kernel costs exactly
# (windowed 4.02 / global 5.91 / mlp 6.66 / relpos 1.07), so these legs
# are faithful. Points: wps=1 (the r5b WPSB=1 leg mis-set the budget —
# d*window^2*c <= WPSB needs >= 196608 for d=1), small windowed q-blocks
# (QQ now applies to w<=16 when set), and a windowed online-softmax
# split (KQ=128).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5c.log
echo "=== queue_r5c waiting for r5b $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5b.done ]; do sleep 60; done
echo "=== queue_r5c start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg chain_wps1    1800 env SAM_FLASH_WPSB=196608 python tools/chain_bench.py /tmp/prof_chain5
leg chain_qq128w  1800 env SAM_FLASH_QQ=128 python tools/chain_bench.py /tmp/prof_chain6
leg chain_qq64w   1800 env SAM_FLASH_QQ=64 python tools/chain_bench.py /tmp/prof_chain7
leg chain_kq128   1800 env SAM_FLASH_KQ=128 python tools/chain_bench.py /tmp/prof_chain8
echo "=== queue_r5c done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5c.done
