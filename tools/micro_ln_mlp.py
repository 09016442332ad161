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
    elif which == "mbconv":
        # What bounds the fused MBConv kernel (30 ms of the 193 ms MobileSAM
        # B=128 iteration for stage 0's two blocks)? Time the real kernel,
        # then a gelu->identity build (upper bound on any GELU rework) and a
        # rational-erf build (P3/Q3, no exp) at the same geometry.
        import yolo_sam_inference_tpu.ops.mbconv_fused as mb

        bsz, hw, c = 128, 128, 64
        e = 4 * c
        x = jnp.asarray(rng.normal(size=(bsz, hw, hw, c)), jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(0, 0.1, (c, e)), jnp.float32)
        b1 = jnp.zeros((e,), jnp.float32)
        wd = jnp.asarray(rng.normal(0, 0.2, (3, 3, 1, e)), jnp.float32)
        bd = jnp.zeros((e,), jnp.float32)
        w3 = jnp.asarray(rng.normal(0, 0.1, (e, c)), jnp.float32)
        b3 = jnp.zeros((c,), jnp.float32)

        real_gelu = mb._gelu_f32

        def as_gelu(v):
            # the SAM_ERF_AS=1 fallback path (exp-based Abramowitz-Stegun)
            xf = v * (2.0 ** -0.5)
            sign = jnp.sign(xf)
            ax = jnp.abs(xf)
            t = 1.0 / (1.0 + 0.3275911 * ax)
            poly = t * (0.254829592 + t * (-0.284496736 + t * (
                1.421413741 + t * (-1.453152027 + t * 1.061405429))))
            erf = sign * (1.0 - poly * jnp.exp(-ax * ax))
            return v * 0.5 * (1.0 + erf)

        def recip_gelu(v):
            # rational erf with pl.reciprocal(approx)+1 Newton step for 1/Q
            from jax.experimental import pallas as pl2

            w = v * (2.0 ** -0.5)
            uu = w * w
            p = (7.9773798e-01 + uu * (1.3141873e-01
                 + uu * (2.8835702e-02 + uu * 3.9488860e-04)))
            q = (1.0 + uu * (4.9692304e-01
                 + uu * (1.0365437e-01 + uu * 7.7713679e-03)))
            r = pl2.reciprocal(q, approx=True)
            r = r * (2.0 - q * r)
            t = jnp.clip(v * (p * r), -1.0, 1.0)
            return v * 0.5 * (1.0 + t)

        variants = [
            ("shipped default (rational erf)", real_gelu),
            ("erf A-S (exp-based)", as_gelu),
            ("rational + fast recip", recip_gelu),
            ("identity (no gelu)", lambda v: v),
        ]
        for name, fn in variants:
            mb._gelu_f32 = fn
            mb.mbconv_block.clear_cache()

            def step(v):
                return mb.mbconv_block(v, w1, b1, wd, bd, w3, b3)

            ms = timeit_chained(step, x, inner=10, outer=4)
            per_iter = ms * 2  # two stage-0 blocks per model iteration
            print(f"{name}: {ms:.3f} ms/block  (~{per_iter:.1f} ms per 2-block iter)")
        mb._gelu_f32 = real_gelu
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
    elif which == "relpos":
        # Isolate the rel-pos score-table kernel at the exact config-1 bench
        # shapes (B=128, S=32, ViT-B): the r4-close flash microbench measured
        # flash_attention_grid with rhw PREcomputed, so relpos_tables' cost
        # (flash_attention.py:863 bucket, ~12.8 ms/iter in the r3u trace) was
        # never isolated. 8 windowed (w=16) + 4 global (w=32) calls per iter.
        from yolo_sam_inference_tpu.ops.flash_attention import relpos_tables

        b, s, heads, hd = 128, 32, 12, 64
        c = heads * hd
        qkv = jnp.asarray(rng.normal(size=(b, s, s, 3 * c)), jnp.bfloat16)
        rh = jnp.asarray(rng.normal(size=(31, hd)) * 0.02, jnp.float32)
        rw31 = jnp.asarray(rng.normal(size=(31, hd)) * 0.02, jnp.float32)
        rh63 = jnp.asarray(rng.normal(size=(63, hd)) * 0.02, jnp.float32)
        rw63 = jnp.asarray(rng.normal(size=(63, hd)) * 0.02, jnp.float32)
        total = 0.0
        for window, th, tw, nlayers in ((16, rh, rw31, 8), (32, rh63, rw63, 4)):

            def step(v, th=th, tw=tw, window=window):
                o = relpos_tables(v, th, tw, heads=heads, window=window)
                # fold 128 lanes of the output back into qkv so the loop
                # carries; dynamic_update_slice touches only those lanes so
                # the fold costs ~0.3 ms, not a full qkv pass
                upd = (v[..., :128] + o[..., :128] * jnp.bfloat16(1e-3)).astype(
                    v.dtype
                )
                return jax.lax.dynamic_update_slice(v, upd, (0, 0, 0, 0))

            ms = timeit_chained(step, qkv, inner=10, outer=4)
            total += ms * nlayers
            print(f"relpos window={window}: {ms:.3f} ms/call "
                  f"({nlayers} layers -> {ms*nlayers:.1f} ms/iter, incl add)")
        print(f"relpos total (config-1 layer mix): {total:.1f} ms/iter")


if __name__ == "__main__":
    main()
