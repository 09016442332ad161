#!/bin/bash
# Round-3 follow-up queue: relpos-v2 A/B legs + fresh config-1 profile
# traces. Waits for tpu_queue_r3b.sh's completion marker so exactly one
# TPU client runs at a time. Same contract as tpu_queue_r3.sh: results
# append to /tmp/tpu_queue_results.jsonl, progress to /tmp/tpu_queue_r3.log.
# Start: cd <repo> && nohup bash tools/tpu_queue_r3c.sh & echo $! > /tmp/tpu_queue_r3c.pid
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r3.log
OUT=/tmp/tpu_queue_results.jsonl
echo "=== queue_r3c waiting for r3b $(date) ===" >> "$LOG"

while ! grep -q "queue_r3b complete" "$LOG" 2>/dev/null; do
  sleep 60
done
echo "=== queue_r3c start $(date) ===" >> "$LOG"

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

# -- relpos-v2 A/B (the default_refresh leg just before this is the base) --
run relpos_v2 SAM_RELPOS_V2=1
run vitl_relpos_v2 BENCH_SAM=facebook/sam-vit-large BENCH_BATCH=32 SAM_RELPOS_V2=1
# -- fresh config-1 attribution traces at the serving shape ----------------
echo "--- profile default start $(date) ---" >> "$LOG"
BENCH_BATCH=128 timeout 1800 python tools/profile_bench.py /tmp/prof_def \
  > /tmp/prof_def.txt 2>>"$LOG"
timeout 300 python tools/attribute_trace.py /tmp/prof_def /tmp/fused_hlo.txt \
  > /tmp/attr_def.txt 2>>"$LOG"
echo "--- profile v2 start $(date) ---" >> "$LOG"
SAM_RELPOS_V2=1 BENCH_BATCH=128 timeout 1800 python tools/profile_bench.py /tmp/prof_v2 \
  > /tmp/prof_v2.txt 2>>"$LOG"
timeout 300 python tools/attribute_trace.py /tmp/prof_v2 /tmp/fused_hlo.txt \
  > /tmp/attr_v2.txt 2>>"$LOG"
echo "=== queue_r3c complete $(date) ===" >> "$LOG"
