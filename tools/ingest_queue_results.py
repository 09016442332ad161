"""Format the TPU measurement queue's JSONL into a BENCH_NOTES table.

The round-3 queues (tools/tpu_queue.sh, tools/tpu_queue2.sh) append
``{"tag": ..., "line": {bench JSON | error}}`` records to
/tmp/tpu_queue_results.jsonl as the relay lets them run. This prints a
markdown table (latest record per tag wins) ready to paste into
BENCH_NOTES.md, plus a short anomaly report (errors, fallbacks,
regressions vs the ledger's standing numbers).

Usage: python tools/ingest_queue_results.py [path-to-jsonl]
"""

from __future__ import annotations

import json
import sys

# tag -> (description, standing number to compare against, or None)
TAGS = {
    "default": ("config 1: ViT-B B=128 chunked (driver default)", 503.2),
    "mobilesam": ("config 2: MobileSAM + fused merge/dw_ln_mlp kernels", 664.4),
    "mobilesam_tvbf16": ("config 2 + bf16 MBConv VPU stretch", 664.4),
    "mobilesam_tvs2d": ("config 2 + exact s2d stems", 664.4),
    "mobilesam_tv_both": ("config 2 + both TinyViT experiments", 664.4),
    "vitl": ("config 3: ViT-L B=32 + tiled MLP kernel", 133.0),
    "vitl_notiled": ("config 3 SAM_TILED_MLP=0 (A/B baseline)", 133.0),
    "vith2048": ("config 4: ViT-H 2048 B=2 + tiled MLP", 15.25),
    "vitl_int8": ("config 3 + w8a8 int8 (fused kernels)", 133.0),
    "vith2048_int8": ("config 4 + w8a8 int8", 15.25),
    "e2e": ("honest disk-to-CSV path + native PNG decode", 33.6),
    "vitb_int8": ("config 1 + w8a8 int8 (fused kernels)", 503.2),
    "vitb_int8_nofused": ("config 1 int8 SAM_INT8_FUSED=0 (A/B)", 503.2),
    "vitl_int8_nofused": ("config 3 int8 SAM_INT8_FUSED=0 (A/B)", 133.0),
    "default_refresh": ("config 1 final warm refresh (.bench_last.json)", 503.2),
    "vith2048_int8_tiled": ("config 4 int8 + tiled int8 MLP kernel", 15.25),
    "vith2048_int8_notiled": ("config 4 int8 SAM_TILED_MLP=0 (A/B)", 15.25),
    "default_refresh2": ("config 1 final warm refresh, queue3", 503.2),
    "e2e_fm": ("honest e2e, fetch_masks=False CSV-only fetch (256 files)", 62.38),
    "e2e_768": ("honest e2e at 768 files (steady-state share 5/6)", 75.62),
    "relpos_v2": ("config 1 + dot-only rel-pos tables (SAM_RELPOS_V2)", 504.36),
    "vitl_relpos_v2": ("config 3 + dot-only rel-pos tables", 162.37),
    "i2t_v2": ("config 1 + shared-source i2t fast path (SAM_I2T_V2)", 504.36),
    "combined_v2": ("config 1 + relpos_v2 + i2t_v2", 504.36),
    "mobilesam_i2t_v2": ("config 2 + shared-source i2t fast path", 648.46),
    "mobilesam_tvbf16_fixed": ("config 2 + bf16 MBConv, post erf-fp32 fix", 648.46),
    "mobilesam_tv_both_fixed": ("config 2 + bf16 MBConv + s2d stems, post fix", 648.46),
    "mobilesam_attn_cells": ("config 2 + cell-layout window attention", 648.46),
    "mobilesam_merge32": ("config 2 + TINYVIT_FUSED_MERGE_MIN_H=32 (A/B)", 664.01),
}


def main(path: str = "/tmp/tpu_queue_results.jsonl") -> None:
    latest = {}
    bad_lines = 0
    try:
        with open(path) as f:
            for raw in f:
                raw = raw.strip()
                if not raw:
                    continue
                try:
                    rec = json.loads(raw)
                    latest[rec.get("tag", "?")] = rec.get("line", {})
                except (json.JSONDecodeError, AttributeError):
                    # a truncated line (writer killed mid-append) must not
                    # take down the report for the valid records around it
                    bad_lines += 1
    except FileNotFoundError:
        print(f"no results yet: {path} missing")
        return

    print("| tag | config | img/s | vs standing | note |")
    print("|---|---|---|---|---|")
    anomalies = []
    for tag, (desc, standing) in TAGS.items():
        line = latest.get(tag)
        if line is None:
            print(f"| {tag} | {desc} | — | — | pending |")
            continue
        if "error" in line:
            anomalies.append(f"{tag}: ERROR {line.get('raw', '')[:120]}")
            print(f"| {tag} | {desc} | — | — | ERROR |")
            continue
        val = line.get("value")
        note = ""
        if "fallback" in line:
            note = "FALLBACK (not a live run)"
            anomalies.append(f"{tag}: fallback result, rerun needed")
        delta = ""
        if standing and isinstance(val, (int, float)):
            delta = f"{(val - standing) / standing:+.1%}"
            if val < 0.97 * standing and not note:
                anomalies.append(f"{tag}: {val} vs standing {standing} (-3%+)")
        print(f"| {tag} | {desc} | {val} | {delta} | {note} |")
    for tag, line in latest.items():
        if tag not in TAGS:
            print(f"| {tag} | (unknown tag) | {line.get('value', '—')} | | |")

    if bad_lines:
        anomalies.append(f"{bad_lines} malformed JSONL line(s) skipped")
    if anomalies:
        print("\nAnomalies:")
        for a in anomalies:
            print(f"- {a}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
