#!/bin/bash
# Follow-up TPU measurement queue (session 4): waits for queue2 to finish
# (or die), then measures the kernels added after queue2 launched —
# currently the ViT-H weight-tiled int8 tail (fused_ln_mlp_tiled_int8).
# Results append to /tmp/tpu_queue_results.jsonl; progress to
# /tmp/tpu_queue3.log.
# Start: cd <repo> && nohup bash tools/tpu_queue3.sh & echo $! > /tmp/tpu_queue3.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue3.log
OUT=/tmp/tpu_queue_results.jsonl
echo "=== queue3 start $(date) ===" >> "$LOG"

PRIOR_PID=$(cat /tmp/tpu_queue2.pid 2>/dev/null)
while true; do
  if [ ! -f /tmp/tpu_queue2.log ] && [ -z "$PRIOR_PID" ]; then
    echo "queue2 never ran here; proceeding $(date)" >> "$LOG"
    break
  fi
  if grep -q "queue2 complete" /tmp/tpu_queue2.log 2>/dev/null; then
    echo "queue2 complete $(date)" >> "$LOG"
    break
  fi
  if [ -n "$PRIOR_PID" ] && ! kill -0 "$PRIOR_PID" 2>/dev/null; then
    echo "queue2 pid $PRIOR_PID gone $(date)" >> "$LOG"
    break
  fi
  sleep 60
done

while true; do
  if timeout 90 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
    echo "RELAY OK $(date)" >> "$LOG"
    break
  fi
  echo "relay still down $(date)" >> "$LOG"
  sleep 120
done

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

# ViT-H int8: now takes the tiled int8 kernel; the A/B legs isolate it
# (queue1's vith2048_int8 ran before this kernel existed only if queue1
# started first — bench reads the repo at run time, so if queue1 runs
# after the kernel commit its vith2048_int8 IS the fused number and the
# _notiled leg here is the A/B baseline)
run vith2048_int8_tiled BENCH_SAM=facebook/sam-vit-huge BENCH_SIZE=2048 BENCH_BATCH=2 BENCH_QUANT=int8
run vith2048_int8_notiled BENCH_SAM=facebook/sam-vit-huge BENCH_SIZE=2048 BENCH_BATCH=2 BENCH_QUANT=int8 SAM_TILED_MLP=0
# refresh the default record + .bench_last.json last
run default_refresh2
echo "=== queue3 complete $(date) ===" >> "$LOG"
