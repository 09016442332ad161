"""Per-op + timeline-gap analysis of a fused-bench profile trace.

The r4-close isolated microbench (docs/KERNELS.md) showed the flash
kernels run ~33 ms/iter in isolation while the in-program trace
attributes ~68.7 ms to flash_attention.py source lines. This tool
decides where that delta actually lives:

  1. per-op table — every INDIVIDUAL device op (not a line aggregate)
     whose HLO metadata points at a file matching --filter, with call
     count, mean and total duration, and result shape. Separates the
     flash_attention_grid custom-calls from the relpos_tables kernel
     (same file, different lines) and from any XLA-inserted copies.
  2. timeline gaps — reconstructs the main device lane, sums the idle
     time BETWEEN consecutive op events, and buckets each gap by the
     (prev op -> next op) pair. If the in-program/isolated delta is
     scheduling bubbles around the kernels, it shows up here, not in
     the op durations.

Usage: python tools/flash_gap.py /tmp/prof /tmp/fused_hlo.txt [regex]
Run after tools/profile_bench.py (which writes both inputs; 3 iters).
"""

import collections
import glob
import gzip
import json
import re
import sys

ITERS = 3  # profile_bench traces 3 iterations


def load_hlo(hlo_path: str):
    """op name -> (src 'file:line' or '', result shape string)."""
    pat = re.compile(
        r"%([\w.\-]+) = ((?:\(|[a-z0-9]+\[)[^ ]*)"
        r".*?(?:metadata=\{op_name=\"([^\"]*)\""
        r"(?:.*?source_file=\"([^\"]*)\")?(?:.*? source_line=(\d+))?)?"
    )
    out = {}
    with open(hlo_path) as f:
        for line in f:
            m = pat.search(line)
            if not m:
                continue
            name, shape, op, sf, sl = m.groups()
            src = ""
            if sf and sl:
                src = "/".join(sf.split("/")[-2:]) + f":{sl}"
            out[name] = (src, shape)
    return out


def main(tracedir: str, hlo_path: str, filt: str = "flash_attention|fused_ln"):
    hlo = load_hlo(hlo_path)
    paths = glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {tracedir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()
    }
    ev = []
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e["pid"] not in dev_pids:
            continue
        n = e["name"]
        if n.startswith("jit_") or n.startswith("jit("):
            continue
        ev.append(e)

    # ---- 1. per-op table for ops matching the filter -----------------
    frex = re.compile(filt)
    stats = collections.defaultdict(lambda: [0, 0.0])  # name -> [count, dur]
    for e in ev:
        base = e["name"]
        stats[base][0] += 1
        stats[base][1] += e["dur"]
    rows = []
    for name, (cnt, dur) in stats.items():
        key = name.split(".")[0]
        src, shape = hlo.get(name, hlo.get(key, ("", "?")))
        rows.append((dur, cnt, name, src, shape))
    rows.sort(reverse=True)
    print(f"== per-op (filter: {filt}) ==")
    shown = 0
    for dur, cnt, name, src, shape in rows:
        if not frex.search(src) and not frex.search(name):
            continue
        print(
            f"{dur/1e3/ITERS:8.3f} ms  n={cnt//ITERS:3d}  "
            f"mean={dur/1e3/cnt:7.3f} ms  {name[:44]:44s} {src:32s} {shape[:48]}"
        )
        shown += 1
        if shown >= 40:
            break

    # ---- 2. top individual ops overall (context) ---------------------
    print("\n== top 25 individual ops (all) ==")
    for dur, cnt, name, src, shape in rows[:25]:
        print(
            f"{dur/1e3/ITERS:8.3f} ms  n={cnt//ITERS:3d}  "
            f"mean={dur/1e3/cnt:7.3f} ms  {name[:44]:44s} {src:32s} {shape[:48]}"
        )

    # ---- 3. timeline gap analysis on the busiest device lane ---------
    lanes = collections.defaultdict(list)
    for e in ev:
        lanes[(e["pid"], e.get("tid", 0))].append(e)
    lane_key = max(lanes, key=lambda k: sum(e["dur"] for e in lanes[k]))
    lane = sorted(lanes[lane_key], key=lambda e: e["ts"])
    busy = sum(e["dur"] for e in lane)
    span = lane[-1]["ts"] + lane[-1]["dur"] - lane[0]["ts"]
    gaps = collections.Counter()
    overlap = 0.0
    total_gap = 0.0
    prev_end = lane[0]["ts"]
    prev_name = "<start>"
    for e in lane:
        g = e["ts"] - prev_end
        if g > 0:
            total_gap += g
            gaps[(prev_name.split(".")[0], e["name"].split(".")[0])] += g
        elif g < 0:
            overlap += -g
        if e["ts"] + e["dur"] > prev_end:
            prev_end = e["ts"] + e["dur"]
            prev_name = e["name"]
    print(
        f"\n== timeline (lane {lane_key}, {len(lane)} events) ==\n"
        f"span {span/1e3/ITERS:.2f} ms/iter, busy {busy/1e3/ITERS:.2f}, "
        f"gaps {total_gap/1e3/ITERS:.2f}, nested/overlap {overlap/1e3/ITERS:.2f}"
    )
    print("-- top gap pairs (prev -> next) --")
    for (a, b), g in gaps.most_common(15):
        print(f"{g/1e3/ITERS:8.3f} ms  {a[:40]} -> {b[:40]}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *(sys.argv[3:4] or []))
