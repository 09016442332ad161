#!/bin/bash
# Round-5 queue n (waits for r5m): validate the shipping defaults
# (wpair+vsum+clamp+bqy16+vmem64) in the chain, then the FULL-BENCH
# config-1 A/B (cold compile — the program changed) and a ViT-L sanity
# leg (its one_window path picked up vsum+clamp).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5n.log
echo "=== queue_r5n waiting for r5m $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5m.done ]; do sleep 60; done
echo "=== queue_r5n start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg chain_defaults 1800 python tools/chain_bench.py /tmp/prof_def1
leg c1_full 2400 env BENCH_NO_WATCHDOG=1 python bench.py
leg vitl_sanity 2400 env BENCH_NO_WATCHDOG=1 BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=32 python bench.py
echo "=== queue_r5n done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5n.done
