#!/bin/bash
# Round-5 queue k (waits for r5j): TinyViT window-pack sweep on the c2
# encoder harness — stage 3 (ws=14, 6 blocks) runs pack=1 under the
# default 256-token cap; 448 enables pack=2 there and pack=8 on the
# ws=7 stages.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5k.log
echo "=== queue_r5k waiting for r5j $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5j.done ]; do sleep 60; done
echo "=== queue_r5k start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg c2enc_pack448 2400 env SAM_TV_PACKCAP=448 python tools/c2_encoder_bench.py /tmp/prof_c2e2
leg c2enc_pack512 2400 env SAM_TV_PACKCAP=512 python tools/c2_encoder_bench.py /tmp/prof_c2e3
echo "=== queue_r5k done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5k.done
