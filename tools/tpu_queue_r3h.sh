#!/bin/bash
# Round-3 session-7 queue h: (1) Mosaic-path parity for the reworked strip
# kernels incl. the residual-free stride-1 merge, (2) MBConv gelu-variant
# microbench (what share of the 31 ms is the fp32 erf GELU), (3) bench
# ledger legs: default (s1 merge ON), s1 merge OFF, and a MERGE_MIN_H=32
# re-probe (the old negative was measured with the HBM-staged padded
# kernels the previous commit removed).
# Start: cd <repo> && nohup bash tools/tpu_queue_r3h.sh > /tmp/tpu_queue_r3h.log 2>&1 & echo $! > /tmp/tpu_queue_r3h.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3h.log

echo "=== queue_r3h start $(date) ===" >> "$LOG"
until timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 90
done
echo "RELAY OK $(date)" >> "$LOG"

echo "--- device parity (Mosaic path) $(date) ---" >> "$LOG"
timeout 1200 python tools/device_parity_tv.py > /tmp/parity_tv.txt 2>>"$LOG"
echo "parity rc=$? $(date)" >> "$LOG"

echo "--- micro mbconv gelu variants $(date) ---" >> "$LOG"
timeout 1200 python tools/micro_ln_mlp.py mbconv > /tmp/micro_mbconv.txt 2>>"$LOG"
echo "micro rc=$? $(date)" >> "$LOG"

echo "--- bench default (s1 merge ON) $(date) ---" >> "$LOG"
BENCH_SAM=mobile-sam BENCH_BATCH=128 BENCH_NO_WATCHDOG=1 timeout 1800 \
  python bench.py > /tmp/bench_ms_s1on.json 2>>"$LOG"
echo "bench s1on rc=$? $(date)" >> "$LOG"

echo "--- bench s1 merge OFF $(date) ---" >> "$LOG"
TINYVIT_FUSED_MERGE_S1=0 BENCH_SAM=mobile-sam BENCH_BATCH=128 BENCH_NO_WATCHDOG=1 \
  timeout 1800 python bench.py > /tmp/bench_ms_s1off.json 2>>"$LOG"
echo "bench s1off rc=$? $(date)" >> "$LOG"

echo "--- bench MERGE_MIN_H=32 probe $(date) ---" >> "$LOG"
TINYVIT_FUSED_MERGE_MIN_H=32 BENCH_SAM=mobile-sam BENCH_BATCH=128 BENCH_NO_WATCHDOG=1 \
  timeout 1800 python bench.py > /tmp/bench_ms_minh32.json 2>>"$LOG"
echo "bench minh32 rc=$? $(date)" >> "$LOG"

echo "=== queue_r3h done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3h.done
