"""Chained mini-encoder microbench: reproduce the IN-PROGRAM flash cost.

Queue r5a's per-op trace shows the flash_attention_grid custom-calls run
~2.5x their isolated cost inside the fused program (windowed 4.02 ms vs
~1.5 ms net of the accumulator; global 5.92 vs ~1.7) while the LN/MLP
kernels sit at 87-94% of their FLOP floor. sweep_flash.py times the
kernel against loop-invariant inputs, so every tile sweep so far has
optimized the WRONG objective. This tool chains the real per-layer op
sequence at exact config-1 shapes

    qkv = fused_ln_matmul(x, ln1, Wqkv)      # ops/fused_ln.py
    rhw = relpos_tables(qkv, rel_h, rel_w)   # ops/flash_attention.py
    h   = flash_attention_grid(qkv, rhw, wproj=..)   # fused out-proj
    x   = fused_ln_mlp(x, h, ln2, W1, W2)    # block tail

for a [windowed, windowed, global] layer stack (the 8:4 mix compressed),
traces 3 iterations with jax.profiler, and prints per-op device times.
If the chained flash matches the in-program 4.02/5.92, flash tile knobs
(SAM_FLASH_QQ/KQ/WPSB — read at trace time) can be swept HERE in seconds
per point instead of ~6 min full-program recompiles through the tunnel.

Usage (device): python tools/chain_bench.py [tracedir]
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

    from yolo_sam_inference_tpu.ops.flash_attention import (
        flash_attention_grid,
        relpos_tables,
    )
    from yolo_sam_inference_tpu.ops.fused_ln import fused_ln_matmul, fused_ln_mlp

    tracedir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_chain"
    b, s, heads, hd, hidden = 128, 32, 12, 64, 3072
    c = heads * hd
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(0, 1, (b, s, s, c)), jnp.bfloat16)
    layers = []
    for window in (16, 16, 32):
        layers.append(dict(
            window=window,
            ln1s=jnp.ones((c,), jnp.float32),
            ln1b=jnp.zeros((c,), jnp.float32),
            wqkv=jnp.asarray(rng.normal(0, 0.02, (c, 3 * c)), jnp.bfloat16),
            bqkv=jnp.zeros((3 * c,), jnp.float32),
            relh=jnp.asarray(rng.normal(0, 0.02, (2 * window - 1, hd)),
                             jnp.float32),
            relw=jnp.asarray(rng.normal(0, 0.02, (2 * window - 1, hd)),
                             jnp.float32),
            wproj=jnp.asarray(rng.normal(0, 0.02, (c, c)), jnp.bfloat16),
            bproj=jnp.zeros((c,), jnp.float32),
            ln2s=jnp.ones((c,), jnp.float32),
            ln2b=jnp.zeros((c,), jnp.float32),
            w1=jnp.asarray(rng.normal(0, 0.02, (c, hidden)), jnp.bfloat16),
            b1=jnp.zeros((hidden,), jnp.float32),
            w2=jnp.asarray(rng.normal(0, 0.02, (hidden, c)), jnp.bfloat16),
            b2=jnp.zeros((c,), jnp.float32),
        ))

    # windows stay static python ints (closure); weights ride as jit args so
    # the HLO is value-independent (same cache-key discipline as the engine)
    windows = tuple(lp.pop("window") for lp in layers)

    @jax.jit
    def step(x, layers):
        for lp, window in zip(layers, windows):
            qkv = fused_ln_matmul(x, lp["ln1s"], lp["ln1b"], lp["wqkv"],
                                  lp["bqkv"])
            rhw = relpos_tables(qkv, lp["relh"], lp["relw"], heads=heads,
                                window=window)
            h = flash_attention_grid(qkv, rhw, heads=heads, window=window,
                                     wproj=lp["wproj"], bproj=lp["bproj"])
            x = fused_ln_mlp(x, h, lp["ln2s"], lp["ln2b"], lp["w1"],
                             lp["b1"], lp["w2"], lp["b2"])
        return x

    def sync(o):
        np.asarray(o.reshape(-1)[0])

    t0 = time.perf_counter()
    out = step(x0, layers)
    sync(out)
    print(f"warm in {time.perf_counter() - t0:.1f} s", flush=True)
    # wall-clock per chain iteration (3 dispatches, synced)
    t0 = time.perf_counter()
    for _ in range(6):
        out = step(out, layers)
    sync(out)
    wall = (time.perf_counter() - t0) / 6 * 1e3
    jax.profiler.start_trace(tracedir)
    for _ in range(3):
        out = step(out, layers)
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
        per_op[e["name"]][0] += 1
        per_op[e["name"]][1] += e["dur"]
    knobs = {k: os.environ.get(k) for k in
             ("SAM_FLASH_QQ", "SAM_FLASH_KQ", "SAM_FLASH_WPSB")
             if os.environ.get(k)}
    print(f"chain wall {wall:.2f} ms/iter  knobs={knobs or 'default'}")
    agg = collections.defaultdict(float)
    for name, (cnt, dur) in sorted(per_op.items(), key=lambda kv: -kv[1][1]):
        agg[name.split(".")[0]] += dur
        print(f"{dur/1e3/3:8.3f} ms  n={cnt//3}  {name}")
    print("-- aggregated --")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{dur/1e3/3:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
