"""Pallas TPU fused residual-add + LayerNorm.

XLA lowers the ViT encoder's LayerNorms as separate convert+reduce fusions
and the residual adds as their own elementwise fusions; at SAM-ViT-B bench
shape that measured ~37 ms/iter of the ~153 ms device time — ~7x off HBM
speed-of-light for the bytes involved. This kernel streams row blocks once:
reads x (+ optional residual), writes the residual sum and its LayerNorm in
one pass, with the statistics accumulated in fp32 and the elementwise math
kept in the activation dtype.

Replaces the ``_layer_norm`` + ``+`` pairs in the SAM ViT encoder
(models/sam/model.py) on TPU; CPU/tests keep the jnp path (interpret mode
covers kernel parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_rows(y, scale, bias, eps):
    """LayerNorm over the minor axis of a (bm, C) tile; fp32 statistics."""
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    d = yf - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (d * inv).astype(y.dtype) * scale + bias


def _add_ln_kernel(x_ref, r_ref, s_ref, b_ref, y_ref, ln_ref, *, eps: float):
    y = x_ref[...] + r_ref[...]
    y_ref[...] = y
    ln_ref[...] = _ln_rows(y, s_ref[...], b_ref[...], eps)


def _ln_kernel(x_ref, s_ref, b_ref, ln_ref, *, eps: float):
    ln_ref[...] = _ln_rows(x_ref[...], s_ref[...], b_ref[...], eps)


def _pick_bm(m: int, c: int, budget_rows: int = 512) -> int:
    """Largest divisor of m within the row budget (keeps blocks VMEM-sized)."""
    bm = min(m, budget_rows)
    while m % bm:
        bm -= 1
    return bm


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_add_ln(x, res, scale, bias, eps: float = 1e-6, interpret: bool = False):
    """(y, ln) with y = x + res and ln = LayerNorm(y) * scale + bias.

    x, res: (..., C); scale, bias: (C,). One HBM pass instead of three.
    """
    orig_shape = x.shape
    c = x.shape[-1]
    m = x.size // c
    x2 = x.reshape(m, c)
    r2 = res.reshape(m, c)
    bm = _pick_bm(m, c)
    grid = (m // bm,)
    y, ln = pl.pallas_call(
        functools.partial(_add_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, c), x.dtype),
            jax.ShapeDtypeStruct((m, c), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2, r2, scale.reshape(1, c).astype(x.dtype), bias.reshape(1, c).astype(x.dtype))
    return y.reshape(orig_shape), ln.reshape(orig_shape)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_ln(x, scale, bias, eps: float = 1e-6, interpret: bool = False):
    """LayerNorm(x) * scale + bias in one HBM pass (no residual input)."""
    orig_shape = x.shape
    c = x.shape[-1]
    m = x.size // c
    x2 = x.reshape(m, c)
    bm = _pick_bm(m, c)
    grid = (m // bm,)
    ln = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2, scale.reshape(1, c).astype(x.dtype), bias.reshape(1, c).astype(x.dtype))
    return ln.reshape(orig_shape)
