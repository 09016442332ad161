"""Microbench one flash_attention_grid tiling point on the real TPU.

The fused bench program costs ~5 min of remote compile per tiling change;
the kernel in isolation compiles in seconds, so tile sweeps run here and
only the winner gets a full-program A/B. One point per process (the tile
budgets are read from env at trace time): set SAM_FLASH_QQ / SAM_FLASH_KQ /
SAM_FLASH_WPSB, then

    python tools/sweep_flash.py windowed|global [B S C heads window]

Prints ms per kernel call (8 calls per dispatch via fori_loop so the ~2.5 ms
tunnel dispatch overhead stays amortized; the accumulator add costs the same
HBM traffic at every sweep point).
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

    from yolo_sam_inference_tpu.ops.flash_attention import flash_attention_grid

    mode = sys.argv[1] if len(sys.argv) > 1 else "windowed"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    c = int(sys.argv[4]) if len(sys.argv) > 4 else 768
    heads = int(sys.argv[5]) if len(sys.argv) > 5 else 12
    window = int(sys.argv[6]) if len(sys.argv) > 6 else (16 if mode == "windowed" else s)

    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(0, 1, (b, s, s, 3 * c)), jnp.bfloat16)
    rhw = jnp.asarray(rng.normal(0, 1, (b, s, s, 2 * heads * window)), jnp.bfloat16)
    wproj = jnp.asarray(rng.normal(0, 0.02, (c, c)), jnp.bfloat16)
    bproj = jnp.asarray(np.zeros((c,)), jnp.float32)

    inner = 8

    @jax.jit
    def run(qkv, rhw, wproj, bproj):
        # The loop must CARRY the kernel input — an `acc + flash(const...)`
        # body is loop-invariant and XLA hoists the kernel out of the loop
        # entirely (discovered r5: the r4-close "isolated" numbers measured
        # ONE kernel call + 8 accumulator adds, reporting the global variant
        # BELOW its FLOP floor). dynamic_update_slice keeps the carry cost
        # to ~0.3 ms instead of a full qkv pass.
        def body(i, qkv):
            o = flash_attention_grid(
                qkv, rhw, heads, window, wproj=wproj, bproj=bproj
            )
            upd = (qkv[..., :128] + o[..., :128] * jnp.bfloat16(1e-3)).astype(
                qkv.dtype
            )
            return jax.lax.dynamic_update_slice(qkv, upd, (0, 0, 0, 0))

        return jax.lax.fori_loop(0, inner, body, qkv)

    def sync(x):
        np.asarray(x.reshape(-1)[0])

    out = run(qkv, rhw, wproj, bproj)
    sync(out)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out = run(qkv, rhw, wproj, bproj)
    sync(out)
    dt = time.perf_counter() - t0
    ms = dt / (iters * inner) * 1e3
    knobs = {k: os.environ.get(k) for k in
             ("SAM_FLASH_QQ", "SAM_FLASH_KQ", "SAM_FLASH_WPSB")
             if os.environ.get(k)}
    print(f"{mode} B={b} S={s} C={c} h={heads} w={window} "
          f"knobs={knobs or 'default'}: {ms:.3f} ms/call")


if __name__ == "__main__":
    main()
