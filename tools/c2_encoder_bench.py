"""Chained TinyViT-encoder microbench (the config-2 analogue of
tools/chain_bench.py): run the REAL MobileSAM encoder at the bench
geometry (B=128, 512^2) under jax.profiler and print per-op device
times. Config 2 sits at 17% MFU / 44.8% of HBM peak (bytes_count.py) —
small-op-bound — and its top buckets are the tinyvit_attention window
kernel (33.7 ms), mbconv (21.4), dw_ln_mlp (16.4). Kernel variants
sweep here in ~40 s instead of a ~6 min full-program recompile.

Usage (device): python tools/c2_encoder_bench.py [tracedir]
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    import jax.numpy as jnp

    from yolo_sam_inference_tpu.models.sam.tinyvit import (
        TinyViTConfig,
        init_tinyvit_params,
        tinyvit_encoder,
    )

    tracedir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_c2enc"
    b, size = 128, 512
    cfg = TinyViTConfig(image_size=size)
    params = init_tinyvit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # match the engine's production dtype (PipelineOptions.compute_dtype):
    # the bench program runs the encoder in bf16
    from yolo_sam_inference_tpu.pipeline.engine import _cast_floating

    params = _cast_floating(params, jnp.bfloat16)
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.normal(0, 1, (b, size, size, 3)), jnp.bfloat16)

    @jax.jit
    def step(p, x):
        emb = tinyvit_encoder(p, x, cfg)
        # carry: fold the embedding back into the input region so the loop
        # is not loop-invariant (the r4 hoisting lesson)
        upd = x[:, :32, :32, :] + emb[:, :32, :32, :3] * 1e-3
        return jax.lax.dynamic_update_slice(x, upd, (0, 0, 0, 0))

    def sync(o):
        np.asarray(o.reshape(-1)[0])

    t0 = time.perf_counter()
    out = step(params, pix)
    sync(out)
    print(f"warm in {time.perf_counter() - t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(6):
        out = step(params, out)
    sync(out)
    wall = (time.perf_counter() - t0) / 6 * 1e3
    jax.profiler.start_trace(tracedir)
    for _ in range(3):
        out = step(params, out)
    sync(out)
    jax.profiler.stop_trace()

    paths = glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    per_op = collections.defaultdict(lambda: [0, 0.0])
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e or (dev and e["pid"] not in dev):
            continue
        if e["name"].startswith(("jit_", "jit(")):
            continue
        per_op[e["name"].split(".")[0]][0] += 1
        per_op[e["name"].split(".")[0]][1] += e["dur"]
    print(f"tinyvit encoder wall {wall:.2f} ms/iter (B={b}, {size}^2)")
    for name, (cnt, dur) in sorted(per_op.items(), key=lambda kv: -kv[1][1])[:25]:
        print(f"{dur/1e3/3:8.3f} ms  n={cnt//3:3d}  {name}")


if __name__ == "__main__":
    main()
