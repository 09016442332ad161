"""Op-level profile of the fused bench program on the real TPU.

Runs the bench workload under jax.profiler, parses the chrome-trace JSON
(vm.trace.json.gz) with the stdlib, and prints a duration-sorted table of
device ops aggregated by fusion-name prefix. Use this (not wall-clock
micro-timing) for attribution: per-dispatch overhead through the tunnel is
~2.5 ms.
"""

import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def _enable_compile_cache(jax):
    """Persistent compile cache: the remote-compile tunnel costs minutes per
    process otherwise (the in-memory cache is per-process)."""
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

def run_and_trace(tracedir: str) -> None:
    import jax

    _enable_compile_cache(jax)
    import jax.numpy as jnp

    from yolo_sam_inference_tpu.pipeline.engine import (
        CellSegmentationPipeline,
        PipelineOptions,
    )

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    sam_model = os.environ.get("BENCH_SAM", "facebook/sam-vit-base")
    opts = PipelineOptions(batch_size=batch, max_det=16, metric_crop=128)
    pipe = CellSegmentationPipeline(sam_model_type=sam_model, options=opts)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(batch, size, size, 3), dtype=np.uint8)
    dev = jnp.asarray(imgs)

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.reshape(-1)[0])

    sync(pipe.fused_call(dev))  # compile+warm
    # dump the optimized HLO of the same program for attribute_trace.py
    # (hits the in-process/persistent compile cache — no second compile)
    try:
        st = pipe._stages(size, size)
        txt = (
            st["fused_core"]
            .lower(st["yolo_params"], st["sam_params"], st["yolo_s2d"], dev)
            .compile()
            .as_text()
        )
        with open("/tmp/fused_hlo.txt", "w") as f:
            f.write(txt)
    except Exception as e:  # HLO text is best-effort
        print(f"hlo dump failed: {e}")
    jax.profiler.start_trace(tracedir)
    for _ in range(3):
        out = pipe.fused_call(dev)
    sync(out)
    jax.profiler.stop_trace()


def parse(tracedir: str, top: int = 40) -> None:
    paths = glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {tracedir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = [
        e
        for e in trace.get("traceEvents", [])
        if e.get("ph") == "X" and "dur" in e
    ]
    # keep only device-lane events (XLA ops) — they carry 'run_id' or sit in
    # TensorFlow Op / XLA Ops tracks; heuristics: name not starting with '$'
    by_name = collections.Counter()
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    total = 0
    for e in events:
        if dev_pids and e["pid"] not in dev_pids:
            continue
        name = e["name"].split(".")[0]
        by_name[name] += e["dur"]
        total += e["dur"]
    print(f"pids: {pid_names}")
    print(f"total device-op time: {total/1e3/3:.2f} ms/iter (3 iters)")
    for name, dur in by_name.most_common(top):
        print(f"{dur/1e3/3:9.3f} ms  {name}")
    # individual hot ops (full fusion names) for fine-grained attribution
    by_full = collections.Counter()
    for e in events:
        if dev_pids and e["pid"] not in dev_pids:
            continue
        by_full[e["name"]] += e["dur"]
    print("\n-- top individual ops --")
    for name, dur in by_full.most_common(top):
        print(f"{dur/1e3/3:9.3f} ms  {name}")


if __name__ == "__main__":
    tracedir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof"
    if len(sys.argv) > 2 and sys.argv[2] == "parse":
        parse(tracedir)
    else:
        run_and_trace(tracedir)
        parse(tracedir)
