#!/bin/bash
# Round-3 session-6 measurement queue: polls for the axon relay (it wedged
# after a watchdog-killed bench child), then runs, one TPU client at a time:
#   1. e2e directory leg with the new sub-batch timing sample (twice: the
#      first run compiles the B=32 stage programs, the second measures the
#      warmed steady state the metric represents)
#   2. batch-ladder probe B=256 (fixed-overhead amortization A/B)
#   3. a default-config re-run (confirms .bench_last.json freshness)
# Results append to /tmp/tpu_queue_results.jsonl; progress to
# /tmp/tpu_queue_r3e.log.
# Start: cd <repo> && nohup bash tools/tpu_queue_r3e.sh & echo $! > /tmp/tpu_queue_r3e.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3e.log
OUT=/tmp/tpu_queue_results.jsonl
echo "=== queue_r3e start $(date) ===" >> "$LOG"

while true; do
  if timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float((x@x).sum()))" >> "$LOG" 2>&1; then
    echo "RELAY BACK $(date)" >> "$LOG"
    break
  fi
  echo "relay still down $(date)" >> "$LOG"
  sleep 120
done

run() {
  local tag="$1"; shift
  echo "--- $tag start $(date) ---" >> "$LOG"
  local line
  line=$(env "$@" BENCH_NO_WATCHDOG=1 timeout 1800 python bench.py 2>>"$LOG" | tail -1)
  TAG="$tag" LINE="$line" python - >> "$OUT" <<'EOF'
import json, os
tag, line = os.environ["TAG"], os.environ.get("LINE", "")
try:
    parsed = json.loads(line)
    if not isinstance(parsed, dict):
        raise ValueError
except ValueError:
    parsed = {"error": line[-300:]}
parsed["tag"] = tag
print(json.dumps(parsed))
EOF
  echo "--- $tag done $(date) ---" >> "$LOG"
}

run e2e_subsample_cold BENCH_E2E=1
run e2e_subsample_warm BENCH_E2E=1
run e2e_subsample_warm2 BENCH_E2E=1
run batch256 BENCH_BATCH=256 BENCH_CHUNK=2
run default_recheck
echo "=== queue_r3e done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r3e.done
