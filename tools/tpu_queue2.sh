#!/bin/bash
# Follow-up TPU measurement queue (session 3): waits for the primary queue
# (tools/tpu_queue.sh) to finish — or to be dead — then runs the int8
# fused-kernel A/B ladder added after the primary queue launched.
# Results append to /tmp/tpu_queue_results.jsonl; progress to
# /tmp/tpu_queue2.log.
# Start: cd <repo> && nohup bash tools/tpu_queue2.sh & echo $! > /tmp/tpu_queue2.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue2.log
OUT=/tmp/tpu_queue_results.jsonl
echo "=== queue2 start $(date) ===" >> "$LOG"

# 1. wait for the primary queue to complete (or die)
PRIMARY_PID=$(cat /tmp/tpu_queue.pid 2>/dev/null)
while true; do
  if grep -q "queue complete" /tmp/tpu_queue.log 2>/dev/null; then
    echo "primary queue complete $(date)" >> "$LOG"
    break
  fi
  if [ -n "$PRIMARY_PID" ] && ! kill -0 "$PRIMARY_PID" 2>/dev/null; then
    echo "primary queue pid $PRIMARY_PID gone $(date)" >> "$LOG"
    break
  fi
  sleep 60
done

# 2. ensure the relay is actually up (primary may have died with it down)
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

# 3. int8 fused-kernel ladder (fused_ln_mlp_int8 + fused_ln_matmul_int8,
#    committed after the primary queue launched). The primary queue's
#    vitl_int8/vith2048_int8 runs already pick the fused kernels up (bench
#    reads the repo at run time), so the A/B here is the _nofused legs.
run vitb_int8 BENCH_QUANT=int8
run vitb_int8_nofused BENCH_QUANT=int8 SAM_INT8_FUSED=0
run vitl_int8_nofused BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=32 BENCH_QUANT=int8 SAM_INT8_FUSED=0
# 4. refresh the default record + .bench_last.json with a final warm run
run default_refresh
echo "=== queue2 complete $(date) ===" >> "$LOG"
