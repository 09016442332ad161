"""Fused hull support-point selection as one Pallas pass.

The convex-hull front-end scores N boundary candidates against D support
directions and picks, per direction, the extreme candidate (with an exact
integer tie-break). As separate XLA ops the (K, N, D) scores tensor makes
three HBM round-trips (~0.8 GB at bench shape); everything is local to one
cell, so this kernel computes scores (a (2 x N) x (2 x D) contraction),
the per-direction max, and the tie-break select entirely in VMEM.

Candidate points arrive TRANSPOSED ((K, 2, N): r-row, c-row) so the lane
dimension is N; per-direction tie-break among score-tied candidates is
lexicographic max-(r, c), with the (N, 2) coordinate columns materialized
via an identity matmul (a (1, N) -> (N, 1) relayout is not a supported
mosaic shape cast). Coordinates are half-integer, exact in fp32 at any
practical image size (an earlier packed ``(2r+2)*4096+(2c+2)`` key
corrupted decodes once a column coordinate reached 2047.5). Output is
(K, 2, D) (r-plane, c-plane).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _support_kernel(pts_ref, dirs_ref, kw_ref, o_ref, *, kb: int):
    for i in range(kb):
        p = pts_ref[i]  # (2, N) fp32 rows: r, c
        s = jax.lax.dot_general(
            p, dirs_ref[...], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, D)
        mx = jnp.max(s, axis=0, keepdims=True)  # (1, D)
        elig = s >= mx  # (N, D)
        # (N, 2) coordinate columns via identity matmul (lands in the right
        # orientation without an unsupported (1, N)->(N, 1) relayout)
        rc = jax.lax.dot_general(
            p, kw_ref[...], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, 2): [r, c]
        rk, ck = rc[:, 0:1], rc[:, 1:2]  # (N, 1)
        vr = jnp.max(jnp.where(elig, rk, -1e9), axis=0, keepdims=True)  # (1, D)
        vc = jnp.max(
            jnp.where(jnp.logical_and(elig, rk >= vr), ck, -1e9),
            axis=0, keepdims=True,
        )
        o_ref[i] = jnp.concatenate([vr, vc], axis=0)  # (2, D)


@functools.partial(jax.jit, static_argnames=("interpret",))
def support_vertices_tpu(
    pts_t: jnp.ndarray, dirs: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """pts_t (K, 2, N) fp32 + dirs (D, 2) -> support planes (K, 2, D)."""
    k, _, n = pts_t.shape
    d = dirs.shape[0]
    interpret = interpret or jax.default_backend() == "cpu"
    kb = 8
    pad = (-k) % kb
    if pad:
        pts_t = jnp.concatenate(
            [pts_t, jnp.zeros((pad, 2, n), pts_t.dtype)], axis=0
        )
    kw = jnp.eye(2, dtype=jnp.float32)  # (2, 2) identity: rc = p.T
    out = pl.pallas_call(
        functools.partial(_support_kernel, kb=kb),
        grid=((k + pad) // kb,),
        in_specs=[
            pl.BlockSpec((kb, 2, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((2, d), lambda i: (0, 0)),
            pl.BlockSpec((2, 2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((kb, 2, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((k + pad, 2, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(pts_t.astype(jnp.float32), dirs.T.astype(jnp.float32), kw)
    return out[:k]
