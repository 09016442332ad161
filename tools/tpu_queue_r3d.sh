#!/bin/bash
# Round-3 queue, part d: i2t-v2 A/B + combined-flags legs + the 768-file
# honest e2e re-measure. Chains behind tpu_queue_r3c.sh's completion marker
# (one TPU client at a time). Results append to /tmp/tpu_queue_results.jsonl.
# Start: cd <repo> && nohup bash tools/tpu_queue_r3d.sh & echo $! > /tmp/tpu_queue_r3d.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3.log
OUT=/tmp/tpu_queue_results.jsonl
echo "=== queue_r3d waiting for r3c $(date) ===" >> "$LOG"

while ! grep -q "queue_r3c complete" "$LOG" 2>/dev/null; do
  sleep 60
done
echo "=== queue_r3d start $(date) ===" >> "$LOG"

run() {
  local tag="$1"; shift
  echo "--- $tag start $(date) ---" >> "$LOG"
  local line
  line=$(env "$@" BENCH_NO_WATCHDOG=1 timeout 1200 python bench.py 2>>"$LOG" | tail -1)
  TAG="$tag" LINE="$line" python - >> "$OUT" <<'EOF'
import json, os
tag, line = os.environ["TAG"], os.environ.get("LINE", "")
try:
    parsed = json.loads(line)
    if not isinstance(parsed, dict):
        raise ValueError
except ValueError:
    parsed = {"error": "no JSON result", "raw": line[-500:]}
print(json.dumps({"tag": tag, "line": parsed}))
EOF
  echo "--- $tag done $(date): $line ---" >> "$LOG"
  sleep 5
}

run i2t_v2 SAM_I2T_V2=1
run combined_v2 SAM_RELPOS_V2=1 SAM_I2T_V2=1
run mobilesam_i2t_v2 BENCH_SAM=mobile-sam SAM_I2T_V2=1
run e2e_768 BENCH_E2E=1 BENCH_ITERS=3
echo "=== queue_r3d complete $(date) ===" >> "$LOG"
