#!/bin/bash
# Round-3 remainder queue: the legs tpu_queue_r3.sh had not reached when the
# axon relay died (vitl_int8 onward), plus a re-measure of the honest e2e
# path now that fetch_masks=False drops the mask-crop transfer from
# CSV-only directory runs. Same contract as tpu_queue_r3.sh: poll for the
# relay, one TPU client at a time, generous timeouts, results append to
# /tmp/tpu_queue_results.jsonl, progress to /tmp/tpu_queue_r3.log.
# Start: cd <repo> && nohup bash tools/tpu_queue_r3b.sh & echo $! > /tmp/tpu_queue_r3b.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3.log
OUT=/tmp/tpu_queue_results.jsonl
echo "=== queue_r3b start $(date) ===" >> "$LOG"

while true; do
  if timeout 240 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
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

# -- tier 1: the fetch_masks=False e2e re-measure (VERDICT #5 lever) ---------
run e2e_fm BENCH_E2E=1 BENCH_ITERS=3
# -- tier 2: the int8 config ladder remainder ---------------------------------
run vitl_int8 BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=32 BENCH_QUANT=int8
run vith2048_int8_tiled BENCH_SAM=facebook/sam-vit-huge BENCH_SIZE=2048 BENCH_BATCH=2 BENCH_QUANT=int8
# -- tier 3: TinyViT experiments ----------------------------------------------
run mobilesam_tvbf16 BENCH_SAM=mobile-sam BENCH_TV_BF16=1
run mobilesam_tvs2d BENCH_SAM=mobile-sam BENCH_TV_S2D=1
run mobilesam_tv_both BENCH_SAM=mobile-sam BENCH_TV_BF16=1 BENCH_TV_S2D=1
# -- tier 4: A/B kill-switch legs ---------------------------------------------
run vitl_notiled BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=32 SAM_TILED_MLP=0
run vitb_int8_nofused BENCH_QUANT=int8 SAM_INT8_FUSED=0
run vitl_int8_nofused BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=32 BENCH_QUANT=int8 SAM_INT8_FUSED=0
run vith2048_int8_notiled BENCH_SAM=facebook/sam-vit-huge BENCH_SIZE=2048 BENCH_BATCH=2 BENCH_QUANT=int8 SAM_TILED_MLP=0
# -- final: refresh the default record + .bench_last.json ---------------------
run default_refresh
echo "=== queue_r3b complete $(date) ===" >> "$LOG"
