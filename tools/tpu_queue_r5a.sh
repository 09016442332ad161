#!/bin/bash
# Round-5 queue a: MEASUREMENT for the two VERDICT-r4 perf demands.
#  - config 1: per-op + timeline-gap attribution of the ~35 ms the r4
#    microbench says is spent AROUND the flash kernels (flash_gap.py),
#    plus isolated relpos_tables (the never-microbenched kernel that the
#    r3u trace's "global attn 12.76 ms" bucket actually is).
#  - config 2: HLO byte count (bytes_count.py) for the bandwidth roofline
#    the README's "bandwidth-bound" claim never had.
#  - e2e decode-pool data point (E2E_DECODE_PROCS=1 vs threads at N=1).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5a.log
echo "=== queue_r5a start $(date) ===" >> "$LOG"
until timeout 600 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1; do
  echo "relay still down $(date)" >> "$LOG"; sleep 180
done
echo "RELAY OK $(date)" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
hostleg() {  # no device, no spacing needed
  local name=$1; shift
  echo "--- hostleg $name $(date) ---" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "hostleg $name rc=$? ---" >> "$LOG"
}
leg c1_trace 2400 env BENCH_BATCH=128 python tools/profile_bench.py /tmp/prof_c1
cp /tmp/fused_hlo.txt /tmp/fused_hlo_c1.txt 2>> "$LOG"
hostleg c1_attr python tools/attribute_trace.py /tmp/prof_c1 /tmp/fused_hlo_c1.txt
hostleg c1_gap python tools/flash_gap.py /tmp/prof_c1 /tmp/fused_hlo_c1.txt
hostleg c1_bytes python tools/bytes_count.py /tmp/fused_hlo_c1.txt 242.5 128
leg relpos_iso 1800 python tools/micro_ln_mlp.py relpos
leg flash_iso_w 1200 python tools/sweep_flash.py windowed
leg flash_iso_g 1200 python tools/sweep_flash.py global
leg c2_trace 2400 env BENCH_SAM=mobile-sam BENCH_BATCH=128 python tools/profile_bench.py /tmp/prof_c2
cp /tmp/fused_hlo.txt /tmp/fused_hlo_c2.txt 2>> "$LOG"
hostleg c2_attr python tools/attribute_trace.py /tmp/prof_c2 /tmp/fused_hlo_c2.txt
hostleg c2_gap python tools/flash_gap.py /tmp/prof_c2 /tmp/fused_hlo_c2.txt "mbconv|merge|tinyvit|dw_ln"
hostleg c2_bytes python tools/bytes_count.py /tmp/fused_hlo_c2.txt 162.6 128
leg e2e_threads 1800 env BENCH_NO_WATCHDOG=1 BENCH_E2E=1 python bench.py
leg e2e_procs 1800 env BENCH_NO_WATCHDOG=1 BENCH_E2E=1 E2E_DECODE_PROCS=1 python bench.py
echo "=== queue_r5a done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5a.done
