#!/bin/bash
# Round-5 queue z: relpos assembly ablation (measurement-only; default
# program untouched) — bounds the slice-assembly share of the
# 12.8 ms relpos bucket for the next-round ledger.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5z.log
echo "=== queue_r5z start $(date) ===" >> "$LOG"
sleep 60
echo "--- leg relpos_noassm start $(date) ---" >> "$LOG"
timeout 1800 env SAM_RELPOS_ABL=noassm python tools/chain_bench.py /tmp/prof_rpa >> "$LOG" 2>&1
echo "leg relpos_noassm rc=$? $(date)" >> "$LOG"
touch /tmp/tpu_queue_r5z.done
