#!/bin/bash
# Round-4 session-1 queue a:
#  1. fresh default bench with the packed-upload startup fix (compiles the
#     new unpack program, re-warms the fused program cache, refreshes
#     .bench_last.json)
#  2. fresh default bench again, timed — does the live run now fit the
#     150 s watchdog budget?
#  3. the driver's exact command (python bench.py, watchdog on) — expect a
#     LIVE result, no "fallback" key
#  4. config-2 control (MobileSAM, CONV2D_FUSED=dot default)
#  5. config-2 CONV2D_FUSED=dotdense A/B (conv-free dot-rewrite family)
#  6. config-1 CONV2D_FUSED=dotdense A/B
#  7. config-2 BENCH_TV_S2D=1 under the dot default (lost r3u leg)
#  8. int8 accuracy probe (tools/quant_accuracy.py — lost r3u leg)
#  9. honest e2e leg with CPU-utilization sampling (BENCH_E2E=1)
# 10. entry() compile warm (driver insurance)
# Rules: one TPU client at a time; 120 s spacing between ALL legs
# (including after the probe — ADVICE r3); no heavy host work while this
# runs; never kill a mid-compile client.
# Start: cd <repo> && nohup bash tools/tpu_queue_r4a.sh > /tmp/tpu_queue_r4a.log 2>&1 & echo $! > /tmp/tpu_queue_r4a.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r4a.log

echo "=== queue_r4a start $(date) ===" >> "$LOG"
until timeout 600 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"
  sleep 180
done
echo "RELAY OK $(date)" >> "$LOG"
sleep 120

leg() {  # leg <name> <timeout> <cmd...>  (no /usr/bin/time in this image —
  # wall time comes from the SECONDS delta)
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "leg $name rc=$rc wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}

leg warm_new_code 2400 env BENCH_NO_WATCHDOG=1 BENCH_PHASES=1 python bench.py
leg fresh_timed 900 env BENCH_NO_WATCHDOG=1 BENCH_PHASES=1 python bench.py
leg driver_exact 400 python bench.py
leg c2_control 2400 env BENCH_NO_WATCHDOG=1 BENCH_SAM=mobile-sam python bench.py
leg c2_dotdense 2400 env BENCH_NO_WATCHDOG=1 BENCH_SAM=mobile-sam CONV2D_FUSED=dotdense python bench.py
leg c1_dotdense 2400 env BENCH_NO_WATCHDOG=1 CONV2D_FUSED=dotdense python bench.py
leg c2_tvs2d 2400 env BENCH_NO_WATCHDOG=1 BENCH_SAM=mobile-sam BENCH_TV_S2D=1 python bench.py
leg int8_accuracy 2400 env BENCH_SAM=facebook/sam-vit-base python tools/quant_accuracy.py
leg e2e_cpu 2400 env BENCH_NO_WATCHDOG=1 BENCH_E2E=1 python bench.py
echo "--- leg entry_warm start $(date) ---" >> "$LOG"
timeout 2400 python - >> "$LOG" 2>&1 <<'EOF'
import time
t0 = time.time()
import jax
import __graft_entry__ as g
fn, args = g.entry()
jax.jit(fn).lower(*args).compile()
print("entry compile ok", round(time.time() - t0, 1), "s")
EOF
echo "leg entry_warm rc=$? $(date)" >> "$LOG"

echo "=== queue_r4a done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r4a.done
