"""Dynamic int8 (w8a8) matmuls for the big ViT encoder projections.

Why: on v5e the MXU runs int8xint8 at 2x the bf16 FLOP rate (394 TOPS vs
197 TFLOPS). The ViT-L/H encoders are MXU-compute-bound on plain-XLA
matmuls — their MLP weights (1024x4096 / 1280x5120) are too large for the
VMEM-resident fused kernels that carry ViT-B — so int8 is the one
single-chip lever left for those configs (BENCH_NOTES round-2 trace
tables). The reference has no quantization at all (torch fp32/fp16 SAM,
reference ``pipeline.py:76``); this is an opt-in TPU-native extension
(``PipelineOptions.quant='int8'`` / ``BENCH_QUANT=int8``).

Scheme (standard dynamic per-token activation x per-channel weight):

* weights: symmetric per-output-channel int8, scale ``max|w_col| / 127``
  computed once at load time (:func:`quantize_linear_params`);
* activations: symmetric per-token (per row of the flattened input) int8,
  scale computed on the fly — one VPU amax pass that XLA fuses into the
  producing LayerNorm/GELU;
* matmul: ``lax.dot_general`` int8 x int8 with int32 accumulation (lowers
  onto the MXU's native int8 path on TPU);
* epilogue: ``int32 * (row_scale x col_scale) + bias`` in fp32, cast back
  to the activation dtype — XLA fuses this into the consumer.

Everything is plain XLA (no Pallas needed): the MXU int8 lowering and the
elementwise fusions around it are exactly what the compiler already does
well; a hand kernel would only re-derive the same schedule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w):
    """Symmetric per-output-channel int8 quantization of an (in, out) weight.

    Returns ``(wq int8 (in, out), scale fp32 (out,))`` with
    ``w ~= wq * scale``. Zero columns get scale 1 (wq is all-zero there, so
    any finite scale reproduces them exactly). Host-numpy inputs quantize
    in numpy (init trees stay on the host until the engine's packed
    upload — per-leaf eager device ops cost ~100 ms each on the tunneled
    backend); the numpy and jnp paths are numerically identical.
    """
    import numpy as np

    if isinstance(w, np.ndarray) and not isinstance(w, jnp.ndarray):
        w32 = w.astype(np.float32)
        amax = np.max(np.abs(w32), axis=0)
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        wq = np.clip(np.round(w32 / scale), -127, 127).astype(np.int8)
        return wq, scale
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0)  # (out,)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    wq = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def quantize_linear_params(p):
    """{"w", "b"} -> {"wq", "wscale", "b"} (drops the float weight)."""
    wq, scale = quantize_weight(p["w"])
    return {"wq": wq, "wscale": scale, "b": p["b"]}


def int8_linear(
    x: jnp.ndarray, wq: jnp.ndarray, wscale: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """``x @ dequant(wq) + b`` with dynamic per-token int8 activations.

    x: (..., in); wq: (in, out) int8; wscale: (out,) fp32; b: (out,).
    Returns (..., out) in x.dtype. Accumulation is int32 (exact — no
    fp rounding inside the contraction); the only approximation is the
    8-bit rounding of x rows and w columns.
    """
    shape = x.shape
    xf = x.reshape(-1, shape[-1]).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)  # (M, 1)
    xscale = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(xf / xscale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        wq,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (M, out) int32, exact
    out = acc.astype(jnp.float32) * (xscale * wscale[None, :])
    out = out + b.astype(jnp.float32)
    return out.astype(x.dtype).reshape(*shape[:-1], wq.shape[-1])


def is_quantized(p) -> bool:
    """True for a linear-params record produced by quantize_linear_params."""
    return "wq" in p


def apply_linear(p, x: jnp.ndarray) -> jnp.ndarray:
    """Dispatch a linear layer on its params record (float or int8)."""
    if is_quantized(p):
        return int8_linear(x, p["wq"], p["wscale"], p["b"])
    return x @ p["w"] + p["b"]


def quantize_sam_encoder_params(params):
    """Quantize the heavy per-layer projections of a SAM ViT param tree.

    Targets qkv / mlp1 / mlp2 of every vision layer — 11/12 of each
    layer's linear FLOPs (qkv 3C^2 + mlp 8C^2 of 12C^2 total). The output
    projection stays float: it rides VMEM-resident inside the flash
    attention grid kernel (ops/flash_attention.py) where int8 would break
    the fused schedule for 1/12 of the FLOPs. Non-vision parts (prompt
    encoder, decoder, neck) are latency-negligible and stay float.

    Returns a new tree; the input is not mutated. Trees without a "vision"
    subtree (TinyViT/MobileSAM) are returned unchanged.
    """
    if "vision" not in params:
        return params
    new = dict(params)
    vision = dict(params["vision"])
    layers = []
    for lp in vision["layers"]:
        lp = dict(lp)
        lp["attn"] = dict(lp["attn"])
        lp["attn"]["qkv"] = quantize_linear_params(lp["attn"]["qkv"])
        lp["mlp1"] = quantize_linear_params(lp["mlp1"])
        lp["mlp2"] = quantize_linear_params(lp["mlp2"])
        layers.append(lp)
    vision["layers"] = layers
    new["vision"] = vision
    return new
