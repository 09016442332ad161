"""Aggregate a profile trace by source location using the HLO metadata.

Usage: python tools/attribute_trace.py /tmp/prof /tmp/fused_hlo.txt
Parses op-name -> source file:line from the dumped HLO, then sums trace
device-op durations per source location — precise attribution for the whole
fused program (profile_bench.py's name buckets can't tell decoder matmuls
from YOLO convs).
"""

import collections
import glob
import gzip
import json
import re
import sys


def load_hlo_map(hlo_path: str):
    """(op name -> 'file:line (op_name)', op name -> 'dtype[shape]{layout}')
    from HLO metadata. The second map covers ops WITHOUT source metadata
    (XLA-inserted copies/relayouts): their result shape + layout is the only
    handle for identifying which tensor is being re-laid-out."""
    pat = re.compile(
        r"%([\w.\-]+) = .*?metadata=\{op_name=\"([^\"]*)\""
        r"(?:.*?source_file=\"([^\"]*)\")?(?:.*? source_line=(\d+))?"
    )
    shape_pat = re.compile(r"%([\w.\-]+) = ((?:\(|[a-z0-9]+\[)[^ ]*)")
    out = {}
    shapes = {}
    with open(hlo_path) as f:
        for line in f:
            sm = shape_pat.search(line)
            if sm:
                shapes[sm.group(1)] = sm.group(2)
            m = pat.search(line)
            if not m:
                continue
            name, op, sf, sl = m.groups()
            if sf and sl:
                short = "/".join(sf.split("/")[-2:])
                out[name] = f"{short}:{sl}"
            else:
                out[name] = f"(no-src) {op.split('/')[-1]}"
    return out, shapes


def main(tracedir: str, hlo_path: str, top: int = 45) -> None:
    srcmap, shapes = load_hlo_map(hlo_path)
    paths = glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    by_src = collections.Counter()
    unattributed = collections.Counter()
    total = 0
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e["pid"] not in dev_pids:
            continue
        name = e["name"]
        if name.startswith("jit_") or name.startswith("jit("):
            continue  # module-level wrapper event
        total += e["dur"]
        if name in srcmap:
            by_src[srcmap[name]] += e["dur"]
        elif name in shapes:
            # no source metadata (XLA-inserted relayout/copy): bucket by
            # op kind + result shape/layout so the tensor is identifiable
            unattributed[f"{name.split('.')[0]} {shapes[name]}"] += e["dur"]
        else:
            unattributed[name.split(".")[0]] += e["dur"]
    print(f"total device-op time: {total/1e3/3:.2f} ms/iter (3 iters)")
    print("-- by source location --")
    for src, dur in by_src.most_common(top):
        print(f"{dur/1e3/3:9.3f} ms  {src}")
    if unattributed:
        print("-- unattributed (name buckets) --")
        for name, dur in unattributed.most_common(15):
            print(f"{dur/1e3/3:9.3f} ms  {name}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
