#!/bin/bash
# Round-5 queue d (waits for r5c): combined-qkv flash read A/B, bigger
# global q blocks, and the serving binary-response measurement
# (VERDICT r4 next #6: host-CPU ms/request before vs after).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5d.log
echo "=== queue_r5d waiting for r5c $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5c.done ]; do sleep 60; done
echo "=== queue_r5d start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg chain_qkv1   1800 env SAM_FLASH_QKV1=1 python tools/chain_bench.py /tmp/prof_chain9
leg chain_qq512g 1800 env SAM_FLASH_QQ=512 python tools/chain_bench.py /tmp/prof_chain10
leg serve_json   2400 python tools/serve_bench.py --inflight 256 --requests 1024 --warm-requests 128
leg serve_bin    2400 python tools/serve_bench.py --inflight 256 --requests 1024 --warm-requests 128 --fmt bin
echo "=== queue_r5d done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5d.done
