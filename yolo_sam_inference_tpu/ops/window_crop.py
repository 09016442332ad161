"""Per-prompt window crop of the decoder keys stream — gather-free.

The engine's windowed mask head slices a (wg, wg) token window out of
each prompt's (gs, gs, C) keys grid (``pipeline/engine.py`` segment
stage). As ``jax.vmap(dynamic_slice)`` XLA lowers this to a gather
fusion that anchors a batch-second-minor layout on the keys tensor —
forcing a full relayout copy of the pallas i2t output (measured
3.26 ms/iter at config-1 bench shape, the largest single copy in the
r5a trace) plus the 0.63 ms gather itself. This kernel does the same
crop reading the custom-call's native {3,2,1,0} layout: one grid step
per prompt, the (gs, gs, C) plane staged through VMEM, offsets
scalar-prefetched, and an in-VMEM dynamic slice — pure HBM bandwidth
(~1.5 ms at the same shape).

Parity: tests/test_decoder_fused.py::test_window_crop_matches_vmap_slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _crop_kernel(r0_ref, c0_ref, g_ref, o_ref, *, wg: int):
    i = pl.program_id(0)
    r0 = r0_ref[i]
    c0 = c0_ref[i]
    gs = g_ref.shape[2]
    # dynamic ref slicing is fine on the third-minor (row) dim, but Mosaic
    # requires dynamic SUBLANE (column) starts to be provably 8-aligned —
    # so columns crop via a dynamic circular roll (tpu rotate) that brings
    # column c0 to 0, followed by a static slice
    rows = g_ref[0, pl.ds(r0, wg), :, :]  # (wg, gs, C)
    # Mosaic's dynamic rotate is 32-bit-only; bf16 -> f32 -> bf16 is exact
    # and the round-trip stays in VMEM/registers
    r32 = rows.astype(jnp.float32)
    rolled = pltpu.roll(r32, shift=gs - c0, axis=1)
    o_ref[0] = rolled[:, :wg, :].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("wg", "interpret"))
def window_crop(
    grid: jnp.ndarray,
    r0: jnp.ndarray,
    c0: jnp.ndarray,
    wg: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, gs, gs, C) + per-row starts -> (N, wg, wg, C) windows.

    ``r0``/``c0`` must already be clipped to [0, gs - wg] (the engine
    clips); int32.
    """
    n, gs, gs2, c = grid.shape
    assert gs == gs2 and 0 < wg <= gs
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, gs, gs, c), lambda i, r0, c0: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, wg, wg, c), lambda i, r0, c0: (i, 0, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_crop_kernel, wg=wg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, wg, wg, c), grid.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(r0.astype(jnp.int32), c0.astype(jnp.int32), grid)
