"""Carry-safe microbench of the fused i2t decoder kernel at bench shape.

The i2t custom-calls cost 6.44 ms each (x2 layers) in the config-1
trace — the largest non-encoder bucket, shared by every config. This
times the layer-1-style call (full per-prompt keys stream, t2i tail) in
a loop that CARRIES the keys output (the r4 hoisting lesson), and reads
SAM_I2T_ABL (noqp / nosmall / noout) to decompose the cost.

Usage (device): python tools/i2t_bench.py [iters]
"""

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

    from yolo_sam_inference_tpu.ops.decoder_fused import i2t_keys_update

    n, t, c, tq, heads = 2048, 1024, 256, 7, 8
    gs = 32
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.normal(0, 1, (n, t, c)), jnp.bfloat16)
    pe = jnp.asarray(rng.normal(0, 1, (t, c)), jnp.bfloat16)
    kp = jnp.asarray(rng.normal(0, 1, (n, tq, c)), jnp.bfloat16)
    vp = jnp.asarray(rng.normal(0, 1, (n, tq, c)), jnp.bfloat16)
    wq = jnp.asarray(rng.normal(0, 0.05, (c, c)), jnp.bfloat16)
    bq = jnp.zeros((c,), jnp.float32)
    wout = jnp.asarray(rng.normal(0, 0.05, (c, c)), jnp.bfloat16)
    bout = jnp.zeros((c,), jnp.float32)
    lns = jnp.ones((c,), jnp.float32)
    lnb = jnp.zeros((c,), jnp.float32)
    t2i = {
        "qp": jnp.asarray(rng.normal(0, 1, (n, tq, c)), jnp.bfloat16),
        "wk": jnp.asarray(rng.normal(0, 0.05, (c, c)), jnp.bfloat16),
        "bk": jnp.zeros((c,), jnp.float32),
        "wv": jnp.asarray(rng.normal(0, 0.05, (c, c)), jnp.bfloat16),
        "bv": jnp.zeros((c,), jnp.float32),
    }

    @jax.jit
    def step(keys, kp):
        out, t2 = i2t_keys_update(
            keys, pe, kp, vp, wq, bq, wout, bout, lns, lnb,
            heads=heads, t2i=t2i,
        )
        # carry: the output IS the next input (keys-shaped); nudge kp from
        # t2 so neither operand is loop-invariant
        kp2 = kp + t2[:, :tq, :] * jnp.bfloat16(1e-3)
        return out, kp2

    def sync(o):
        np.asarray(o.reshape(-1)[0])

    t0 = time.perf_counter()
    keys_d, kp_d = step(keys, kp)
    sync(keys_d)
    print(f"warm in {time.perf_counter() - t0:.1f} s", flush=True)
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    t0 = time.perf_counter()
    for _ in range(iters):
        keys_d, kp_d = step(keys_d, kp_d)
    sync(keys_d)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(
        f"i2t (N={n}, T={t}, C={c}, t2i tail) "
        f"abl={os.environ.get('SAM_I2T_ABL', 'none')}: {ms:.3f} ms/call"
    )


if __name__ == "__main__":
    main()
