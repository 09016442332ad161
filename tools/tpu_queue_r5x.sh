#!/bin/bash
# Round-5 queue x (waits for r5w): BR=1024 point.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5x.log
until [ -f /tmp/tpu_queue_r5w.done ]; do sleep 30; done
echo "=== queue_r5x start $(date) ===" >> "$LOG"
sleep 120
echo "--- leg chain_br1024 start $(date) ---" >> "$LOG"
timeout 1800 env SAM_LNMM_BR=1024 python tools/chain_bench.py /tmp/prof_br3 >> "$LOG" 2>&1
echo "leg chain_br1024 rc=$? $(date)" >> "$LOG"
sleep 60
touch /tmp/tpu_queue_r5x.done
