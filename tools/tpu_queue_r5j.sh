#!/bin/bash
# Round-5 queue j (waits for r5i): raise the flash kernel's scoped-vmem
# budget (SAM_FLASH_VMEM) — the global layer sits at the default 16 MB
# cliff (three r5 variants OOMed by <1 MB), and v5e VMEM is physically
# larger. Probe bigger global q-blocks + the merged-window path under a
# 64 MB budget.
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/tpu_queue_r5j.log
echo "=== queue_r5j waiting for r5i $(date) ===" >> "$LOG"
until [ -f /tmp/tpu_queue_r5i.done ]; do sleep 60; done
echo "=== queue_r5j start $(date) ===" >> "$LOG"
sleep 120
leg() {
  local name=$1 tmo=$2; shift 2
  echo "--- leg $name start $(date) ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "leg $name rc=$? wall=$((SECONDS - t0))s $(date)" >> "$LOG"
  sleep 120
}
leg chain_vmem64       1800 env SAM_FLASH_VMEM=67108864 python tools/chain_bench.py /tmp/prof_vm1
leg chain_vmem64_qq512 1800 env SAM_FLASH_VMEM=67108864 SAM_FLASH_QQ=512 python tools/chain_bench.py /tmp/prof_vm2
leg chain_wpair_vmem   1800 env SAM_FLASH_WPAIR=1 SAM_FLASH_VSUM=1 SAM_FLASH_VMEM=67108864 python tools/chain_bench.py /tmp/prof_vm3
echo "=== queue_r5j done $(date) ===" >> "$LOG"
touch /tmp/tpu_queue_r5j.done
