#!/bin/bash
# i2t decomposition queue: baseline + ablations (measurement-only).
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r6a.log
echo "=== queue_r6a start $(date) ===" >> "$LOG"
sleep 30
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? $(date)" >> "$LOG"
  sleep 120
}
leg i2t_base    1800 python tools/i2t_bench.py
leg i2t_noqp    1800 env SAM_I2T_ABL=noqp python tools/i2t_bench.py
leg i2t_nosmall 1800 env SAM_I2T_ABL=nosmall python tools/i2t_bench.py
leg i2t_noout   1800 env SAM_I2T_ABL=noout python tools/i2t_bench.py
echo "=== queue_r6a done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r6a.done
