"""Microbench fused_ln_mlp / fused_ln_matmul / flash_attention_grid on TPU."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def timeit(f, *a, iters=30):
    out = f(*a)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def timeit_chained(step, x0, inner=20, outer=5):
    """One dispatch per `inner` kernel applications (x -> step(x)), so the
    ~2.5 ms tunnel dispatch overhead amortizes away."""
    import functools

    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, inner, lambda i, v: step(v), x)

    out = many(x0)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(outer):
        out = many(out)
    sync(out)
    return (time.perf_counter() - t0) / (outer * inner) * 1e3


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "mlp"
    rng = np.random.default_rng(0)
    if which == "mlp":
        from yolo_sam_inference_tpu.ops.fused_ln import fused_ln_mlp

        m, c, hid = 32768, 768, 3072
        x = jnp.asarray(rng.normal(size=(m, c)), jnp.bfloat16)
        a = jnp.asarray(rng.normal(size=(m, c)), jnp.bfloat16)
        s = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(c, hid)) * 0.02, jnp.bfloat16)
        b1 = jnp.zeros((hid,), jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(hid, c)) * 0.02, jnp.bfloat16)
        b2 = jnp.zeros((c,), jnp.float32)
        for br in (128, 256, 512):
            try:
                ms = timeit_chained(
                    lambda v: fused_ln_mlp(v, a, s, b, w1, b1, w2, b2,
                                           block_rows=br) * jnp.bfloat16(0.25),
                    x,
                )
                print(f"block_rows={br}: {ms:.3f} ms  (SOL ~0.96)")
            except Exception as e:
                print(f"block_rows={br}: FAIL {str(e)[:80]}")
    elif which == "flash":
        from yolo_sam_inference_tpu.ops.flash_attention import flash_attention_grid

        b, s, heads, hd = 32, 32, 12, 64
        c = heads * hd
        qkv = jnp.asarray(rng.normal(size=(b, s, s, 3 * c)), jnp.bfloat16)
        for window in (16, 32):
            rhw = jnp.asarray(rng.normal(size=(b, s, s, 2 * heads * window)),
                              jnp.bfloat16)

            def step(v, rhw=rhw, window=window):
                o = flash_attention_grid(v, rhw, heads=heads, window=window)
                return jnp.concatenate([o, o, o], axis=-1) * jnp.bfloat16(0.3)

            ms = timeit_chained(step, qkv)
            print(f"window={window}: {ms:.3f} ms (incl concat overhead)")


if __name__ == "__main__":
    main()
