"""Space-to-depth execution of the narrow early YOLO stages.

The YOLOv8n backbone's first stages run 3-64-channel convs over large
spatial maps; on TPU the MXU contracts 128-deep lanes, so those convs (and
every elementwise op on their outputs) run at <25% lane utilization — they
dominated the YOLO cost in the bench profile. The standard TPU fix is
space-to-depth: store a feature map (S, S, C) as (S/2, S/2, 4C) and rewrite
each conv's weights so the transformed program computes EXACTLY the same
function (zero-structured block kernels; ~4x nominal FLOPs on the narrow
convs, repaid many times over by full-lane execution).

Channel convention is **c-major**: s2d channel index = c * 4 + (p * 2 + q)
for spatial sub-offset (p, q). This keeps YOLO's c2f half-slices and
concats valid in s2d space (a contiguous channel range of the native tensor
maps to a contiguous range of the s2d tensor, and concatenation order is
preserved), so only conv weights need transforming.

Weight mapping (per spatial axis): an output at native pixel
I = stride2 * a + p' (p' = 0 when the output stays native) reads native
input pixel J = stride * I + d - pad; with J = 2 * A + p and input block
A = stride2 * a + e - pad2, solving gives

    d = 2 * (e - pad2) + p - stride * p' + pad

and every (e, p, p', d) combination with d in [0, k) carries the native
weight w[d]; all other block-kernel taps are zero.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .config import YoloConfig

Params = Dict[str, Any]


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), c-major sub-pixel channels."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    y = y.transpose(0, 1, 3, 5, 2, 4)  # (B, h2, w2, C, p, q)
    return y.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    y = x.reshape(b, h2, w2, c, 2, 2)
    y = y.transpose(0, 1, 4, 2, 5, 3)  # (B, h2, p, w2, q, C)
    return y.reshape(b, h2 * 2, w2 * 2, c)


def _block_geometry(k: int, stride: int, s2d_out: bool):
    """(k2, pad2, stride2) of the s2d-space conv; pad2 is the LOW padding and
    the high padding is k2 - 1 - pad2 - (stride2 - 1)."""
    if k == 1 and stride == 1:
        return 1, 0, 1
    if k == 3 and stride == 1:
        assert s2d_out, "stride-1 convs keep the s2d layout"
        return 3, 1, 1
    if k == 3 and stride == 2:
        return (3, 1, 2) if s2d_out else (2, 1, 1)
    raise ValueError(f"unsupported conv geometry k={k} stride={stride}")


def s2d_conv_w(w: np.ndarray, stride: int, s2d_out: bool = True) -> np.ndarray:
    """Native (k, k, Ci, Co) HWIO weights -> s2d block weights
    (k2, k2, 4Ci, 4Co) (or (k2, k2, 4Ci, Co) when the output stays native)."""
    w = np.asarray(w)
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    pad = k // 2
    k2, pad2, _ = _block_geometry(k, stride, s2d_out)
    pouts = (0, 1) if s2d_out else (0,)
    of = 4 if s2d_out else 1
    out = np.zeros((k2, k2, 4 * ci, of * co), w.dtype)
    for eh in range(k2):
        for ew in range(k2):
            for p in (0, 1):
                for q in (0, 1):
                    for ph in pouts:
                        for qw in pouts:
                            dh = 2 * (eh - pad2) + p - stride * ph + pad
                            dw = 2 * (ew - pad2) + q - stride * qw + pad
                            if 0 <= dh < k and 0 <= dw < k:
                                ii = p * 2 + q
                                oo = (ph * 2 + qw) if s2d_out else 0
                                out[eh, ew, ii::4, oo::of] = w[dh, dw]
    return out


def _s2d_conv_params(p: Params, stride: int, s2d_out: bool = True) -> Params:
    b = np.asarray(p["b"])
    b2 = np.repeat(b, 4) if s2d_out else b  # c-major: each c spreads to 4 slots
    return {
        "w": jnp.asarray(s2d_conv_w(np.asarray(p["w"]), stride, s2d_out)),
        "b": jnp.asarray(b2),
    }


def _conv_s2d(
    p: Params,
    x: jnp.ndarray,
    k: int = 3,
    stride: int = 1,
    s2d_out: bool = True,
    act=True,
) -> jnp.ndarray:
    """Run a transformed conv on an s2d tensor (geometry passed statically —
    the param tree holds arrays only, so casting/device_put stay trivial).

    act: True = SiLU (YOLO), False = linear, or an activation name accepted
    by ops/conv2d_fused (the TinyViT stems pass "gelu"). 1x1 convs run as
    dots by default (mode "dot", r3q A/B); CONV2D_FUSED=1 swaps the dense
    XLA convs for the Pallas im2row pass too — measured slower on device
    (r3p A/B), so dense stays on XLA."""
    act_name = act if isinstance(act, str) else ("silu" if act else "none")
    k2, pad2, stride2 = _block_geometry(k, stride, s2d_out)
    from ...ops.conv2d_fused import conv2d_fused_enabled, conv2d_supported

    if conv2d_fused_enabled(k2) and conv2d_supported(
        x.shape, k2, stride2, k2_s2d=(k2 != 2 or pad2 == 1)
    ):
        from ...ops.conv2d_fused import conv2d_act

        return conv2d_act(x, p["w"], p["b"], k=k2, stride=stride2, act=act_name)
    pad_hi = k2 - 1 - pad2 - (stride2 - 1)
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride2, stride2),
        padding=((pad2, pad_hi), (pad2, pad_hi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + p["b"].astype(x.dtype)
    if act_name == "gelu":
        return jax.nn.gelu(y, approximate=False)
    return jax.nn.silu(y) if act_name == "silu" else y


def _bottleneck_s2d(p: Params, x: jnp.ndarray, shortcut: bool) -> jnp.ndarray:
    y = _conv_s2d(p["cv1"], x, k=3)
    y = _conv_s2d(p["cv2"], y, k=3)
    return x + y if shortcut else y


def _c2f_s2d(p: Params, x: jnp.ndarray, shortcut: bool) -> jnp.ndarray:
    y = _conv_s2d(p["cv1"], x, k=1)
    c = y.shape[-1] // 2  # c-major layout: native half == s2d half
    parts = [y[..., :c], y[..., c:]]
    for bp in p["m"]:
        parts.append(_bottleneck_s2d(bp, parts[-1], shortcut))
    return _conv_s2d(p["cv2"], jnp.concatenate(parts, axis=-1), k=1)


def transform_backbone_params(params: Params) -> Params:
    """Build the s2d weight tree for the narrow backbone prefix
    (stem .. c2f3 + the down4 exit conv). Call once at stage-build time."""
    b = params["backbone"]

    def c2f(p):
        return {
            "cv1": _s2d_conv_params(p["cv1"], 1),
            "cv2": _s2d_conv_params(p["cv2"], 1),
            "m": [
                {
                    "cv1": _s2d_conv_params(m["cv1"], 1),
                    "cv2": _s2d_conv_params(m["cv2"], 1),
                }
                for m in p["m"]
            ],
        }

    return {
        "stem": _s2d_conv_params(b["stem"], 2),
        "down2": _s2d_conv_params(b["down2"], 2),
        "c2f2": c2f(b["c2f2"]),
        "down3": _s2d_conv_params(b["down3"], 2),
        "c2f3": c2f(b["c2f3"]),
        "down4": _s2d_conv_params(b["down4"], 2, s2d_out=False),
        "head": transform_head_p3_params(params),
    }


def transform_head_p3_params(params: Params) -> Params:
    """s2d weights for the FPN head's narrow P3 branch (c2f_up3, the down4
    re-entry conv, and the level-0 detect towers)."""
    h = params["head"]
    d0 = params["detect"][0]

    def c2f(p):
        return {
            "cv1": _s2d_conv_params(p["cv1"], 1),
            "cv2": _s2d_conv_params(p["cv2"], 1),
            "m": [
                {
                    "cv1": _s2d_conv_params(m["cv1"], 1),
                    "cv2": _s2d_conv_params(m["cv2"], 1),
                }
                for m in p["m"]
            ],
        }

    return {
        "c2f_up3": c2f(h["c2f_up3"]),
        "down4": _s2d_conv_params(h["down4"], 2, s2d_out=False),
        "detect0": {
            "box1": _s2d_conv_params(d0["box1"], 1),
            "box2": _s2d_conv_params(d0["box2"], 1),
            "box3": _s2d_conv_params(d0["box3"], 1),
            "cls1": _s2d_conv_params(d0["cls1"], 1),
            "cls2": _s2d_conv_params(d0["cls2"], 1),
            "cls3": _s2d_conv_params(d0["cls3"], 1),
        },
    }


def head_p3_s2d(
    head_s2d: Params, f4: jnp.ndarray, p3_s2d: jnp.ndarray
) -> tuple:
    """The P3 head branch in s2d space.

    f4: native (S/16, c4) from c2f_up4; p3_s2d: (S/16, 4*c3). Returns
    (detect level-0 output native (S/8, 4*reg_max + nc), down4-re-entry
    native (S/16, c3)). Equivalent to the native u3/c2f_up3/detect[0]/down4
    path: 2x nearest upsampling in s2d space is a per-channel 4-repeat
    (every sub-pixel of a block holds the same source pixel, c-major).
    """
    up = jnp.repeat(f4, 4, axis=-1)  # s2d of _upsample2x(f4)
    u3 = jnp.concatenate([up, p3_s2d], axis=-1)
    f3 = _c2f_s2d(head_s2d["c2f_up3"], u3, False)  # (S/16, 4*c3)
    d0 = head_s2d["detect0"]
    box = _conv_s2d(d0["box2"], _conv_s2d(d0["box1"], f3, k=3), k=3)
    box = _conv_s2d(d0["box3"], box, k=1, act=False)
    cls = _conv_s2d(d0["cls2"], _conv_s2d(d0["cls1"], f3, k=3), k=3)
    cls = _conv_s2d(d0["cls3"], cls, k=1, act=False)
    out0 = jnp.concatenate(
        [depth_to_space(box), depth_to_space(cls)], axis=-1
    )
    down = _conv_s2d(head_s2d["down4"], f3, k=3, stride=2, s2d_out=False)
    return out0, down


def backbone_prefix_s2d(
    s2d_params: Params, images: jnp.ndarray
) -> tuple:
    """images (B, S, S, 3) -> (p3 s2d (S/16, 4*C3), down4-out native (S/16, C4)).

    Exactly equivalent to the native stem..down4 prefix of
    :func:`..model.yolo_forward`, executed in s2d space. p3 stays in s2d
    layout for :func:`head_p3_s2d`.
    """
    x = space_to_depth(images)  # (S/2, 12)
    if jnp.issubdtype(x.dtype, jnp.integer):
        # raw uint8 input: the s2d transpose ran on 1/4 the bytes, and the
        # /255 normalize fuses into the stem conv's input read
        x = x.astype(s2d_params["stem"]["w"].dtype) * (1.0 / 255.0)
    x = _conv_s2d(s2d_params["stem"], x, k=3, stride=2)  # P1 s2d: (S/4, 4c1)
    x = _conv_s2d(s2d_params["down2"], x, k=3, stride=2)  # P2 s2d: (S/8, 4c2)
    x = _c2f_s2d(s2d_params["c2f2"], x, True)
    x = _conv_s2d(s2d_params["down3"], x, k=3, stride=2)  # P3 s2d: (S/16, 4c3)
    x = _c2f_s2d(s2d_params["c2f3"], x, True)
    x4 = _conv_s2d(s2d_params["down4"], x, k=3, stride=2, s2d_out=False)
    return x, x4
