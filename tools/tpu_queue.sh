#!/bin/bash
# Round-3 TPU measurement queue: waits for the axon relay to come back,
# then runs the pending device measurements SEQUENTIALLY (one TPU client
# at a time — a hard-killed axon client wedges the device grant, so each
# run gets a generous timeout instead of an aggressive one).
# Results append to /tmp/tpu_queue_results.jsonl; progress to
# /tmp/tpu_queue.log.
# Start: cd <repo> && nohup bash tools/tpu_queue.sh & echo $! > /tmp/tpu_queue.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue.log
OUT=/tmp/tpu_queue_results.jsonl
echo "=== queue start $(date) ===" >> "$LOG"

# 1. wait for the relay
while true; do
  if timeout 90 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
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
  line=$(env "$@" BENCH_NO_WATCHDOG=1 timeout 1200 python bench.py 2>>"$LOG" | tail -1)
  # validate + embed via python so a non-JSON final line (crash, stray
  # warning) records as a labeled error instead of corrupting the JSONL
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

# 2. default config first: re-warms the persistent compile cache with the
#    exact driver program and refreshes .bench_last.json
run default
# 3. MobileSAM with the new fused merge + dw_ln_mlp kernels in the default path
run mobilesam BENCH_SAM=mobile-sam
# 4. TinyViT opt-in experiments
run mobilesam_tvbf16 BENCH_SAM=mobile-sam BENCH_TV_BF16=1
run mobilesam_tvs2d BENCH_SAM=mobile-sam BENCH_TV_S2D=1
run mobilesam_tv_both BENCH_SAM=mobile-sam BENCH_TV_BF16=1 BENCH_TV_S2D=1
# 5. ViT-L / ViT-H with the tiled MLP kernel (and its kill-switch baseline)
run vitl BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=32
run vitl_notiled BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=32 SAM_TILED_MLP=0
run vith2048 BENCH_SAM=facebook/sam-vit-huge BENCH_SIZE=2048 BENCH_BATCH=2
# 6. int8 ladder (ViT-L / ViT-H 2048)
run vitl_int8 BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=32 BENCH_QUANT=int8
run vith2048_int8 BENCH_SAM=facebook/sam-vit-huge BENCH_SIZE=2048 BENCH_BATCH=2 BENCH_QUANT=int8
# 7. honest e2e with the native PNG decoder
run e2e BENCH_E2E=1 BENCH_ITERS=3
echo "=== queue complete $(date) ===" >> "$LOG"
