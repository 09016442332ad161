"""YOLOv8 forward pass + DFL decode as pure JAX functions (NHWC).

Layer graph mirrors the YOLOv8 detect architecture the reference's
checkpoint was trained with (loaded at reference ``pipeline.py:72``):
backbone Conv/C2f/SPPF -> PAN-FPN head -> decoupled detect head with
Distribution Focal Loss box regression. BatchNorm is pre-folded into conv
kernels by the converter, so every block here is conv+SiLU — ideal XLA
fusion material.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import YoloConfig

Params = Dict[str, Any]


def _conv(p: Params, x: jnp.ndarray, stride: int = 1, act: bool = True) -> jnp.ndarray:
    """Conv (+folded BN) + SiLU. Weight layout HWIO; 'same'-style padding.

    1x1 convs run as dots by default (ops/conv2d_fused.py mode "dot",
    r3q A/B); dense convs stay on the XLA path below — the Pallas im2row
    pass (CONV2D_FUSED=1) measured slower on device (r3p A/B)."""
    kh = p["w"].shape[0]
    pad = kh // 2
    from ...ops.conv2d_fused import conv2d_fused_enabled, conv2d_supported

    if conv2d_fused_enabled(kh) and conv2d_supported(x.shape, kh, stride):
        from ...ops.conv2d_fused import conv2d_act

        return conv2d_act(
            x, p["w"], p["b"], k=kh, stride=stride,
            act="silu" if act else "none",
        )
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + p["b"]
    return jax.nn.silu(y) if act else y


def _bottleneck(p: Params, x: jnp.ndarray, shortcut: bool) -> jnp.ndarray:
    y = _conv(p["cv1"], x)
    y = _conv(p["cv2"], y)
    return x + y if shortcut else y


def _c2f(p: Params, x: jnp.ndarray, shortcut: bool) -> jnp.ndarray:
    y = _conv(p["cv1"], x)
    c = y.shape[-1] // 2
    parts = [y[..., :c], y[..., c:]]
    for bp in p["m"]:
        parts.append(_bottleneck(bp, parts[-1], shortcut))
    return _conv(p["cv2"], jnp.concatenate(parts, axis=-1))


def _maxpool5(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 5, 5, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (2, 2), (2, 2), (0, 0)),
    )


def _sppf(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = _conv(p["cv1"], x)
    p1 = _maxpool5(y)
    p2 = _maxpool5(p1)
    p3 = _maxpool5(p2)
    return _conv(p["cv2"], jnp.concatenate([y, p1, p2, p3], axis=-1))


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c)).reshape(
        b, h * 2, w * 2, c
    )


def yolo_forward(
    params: Params, images: jnp.ndarray, cfg: YoloConfig,
    s2d_params: Params = None,
) -> List[jnp.ndarray]:
    """Backbone+head. images: (B, S, S, 3) in [0,1]. Returns per-level raw
    maps [(B, S/8, S/8, 4*reg_max+nc), (S/16...), (S/32...)].

    ``s2d_params`` (from :func:`.s2d.transform_backbone_params`) runs the
    narrow stem..down4 prefix in space-to-depth layout — exactly the same
    function, full-lane MXU utilization (the TPU throughput path).
    """
    b = params["backbone"]
    if s2d_params is not None:
        from .s2d import backbone_prefix_s2d

        p3s, x = backbone_prefix_s2d(s2d_params, images)  # p3 in s2d layout
    else:
        x = _conv(b["stem"], images, stride=2)       # P1
        x = _conv(b["down2"], x, stride=2)           # P2
        x = _c2f(b["c2f2"], x, True)
        x = _conv(b["down3"], x, stride=2)           # P3
        p3 = _c2f(b["c2f3"], x, True)
        x = _conv(b["down4"], p3, stride=2)          # P4
    p4 = _c2f(b["c2f4"], x, True)
    x = _conv(b["down5"], p4, stride=2)              # P5
    x = _c2f(b["c2f5"], x, True)
    p5 = _sppf(b["sppf"], x)

    h = params["head"]
    u4 = jnp.concatenate([_upsample2x(p5), p4], axis=-1)
    f4 = _c2f(h["c2f_up4"], u4, False)
    if s2d_params is not None:
        from .s2d import head_p3_s2d

        out0, dre = head_p3_s2d(s2d_params["head"], f4, p3s)
        d4 = jnp.concatenate([dre, f4], axis=-1)
    else:
        u3 = jnp.concatenate([_upsample2x(f4), p3], axis=-1)
        f3 = _c2f(h["c2f_up3"], u3, False)           # detect P3
        d4 = jnp.concatenate([_conv(h["down4"], f3, stride=2), f4], axis=-1)
    g4 = _c2f(h["c2f_down4"], d4, False)             # detect P4
    d5 = jnp.concatenate([_conv(h["down5"], g4, stride=2), p5], axis=-1)
    g5 = _c2f(h["c2f_down5"], d5, False)             # detect P5

    outs = []
    feats = [None, g4, g5] if s2d_params is not None else [f3, g4, g5]
    for lvl, feat in enumerate(feats):
        if feat is None:
            outs.append(out0)  # level 0 computed in s2d space
            continue
        dp = params["detect"][lvl]
        box = _conv(dp["box2"], _conv(dp["box1"], feat))
        box = _conv(dp["box3"], box, act=False)      # (B, s, s, 4*reg_max)
        cls = _conv(dp["cls2"], _conv(dp["cls1"], feat))
        cls = _conv(dp["cls3"], cls, act=False)      # (B, s, s, nc)
        outs.append(jnp.concatenate([box, cls], axis=-1))
    return outs


def decode_predictions(
    outs: Sequence[jnp.ndarray], cfg: YoloConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DFL decode to (boxes (B, N, 4) xyxy in input pixels, scores (B, N, nc)).

    Matches the ultralytics Detect.inference semantics: anchor centers at
    (i + 0.5) * stride, ltrb distances = softmax-expectation over reg_max
    bins, class scores sigmoid.
    """
    rm = cfg.reg_max
    nc = cfg.num_classes
    boxes_all, scores_all = [], []
    bins = jnp.arange(rm, dtype=jnp.float32)
    for out, stride in zip(outs, cfg.strides):
        b, s1, s2, _ = out.shape
        box = out[..., : 4 * rm].reshape(b, s1, s2, 4, rm)
        dist = jnp.sum(jax.nn.softmax(box.astype(jnp.float32), axis=-1) * bins, axis=-1)
        cx = (jax.lax.broadcasted_iota(jnp.float32, (s1, s2), 1) + 0.5)
        cy = (jax.lax.broadcasted_iota(jnp.float32, (s1, s2), 0) + 0.5)
        x1 = (cx - dist[..., 0]) * stride
        y1 = (cy - dist[..., 1]) * stride
        x2 = (cx + dist[..., 2]) * stride
        y2 = (cy + dist[..., 3]) * stride
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(b, s1 * s2, 4)
        scores = jax.nn.sigmoid(out[..., 4 * rm :].astype(jnp.float32)).reshape(
            b, s1 * s2, nc
        )
        boxes_all.append(boxes)
        scores_all.append(scores)
    return jnp.concatenate(boxes_all, axis=1), jnp.concatenate(scores_all, axis=1)


# ----------------------------------------------------------------------- init


def init_yolo_params(rng, cfg: YoloConfig, dtype=jnp.float32) -> Params:
    """Random-init parameter pytree (authoritative layout; BN pre-folded).

    Host-side numpy init (one transfer per leaf) — per-leaf jax.random ops
    would each trigger a remote compile under the TPU tunnel.
    """
    seed = rng if isinstance(rng, int) else int(np.asarray(rng).sum()) & 0x7FFFFFFF
    nrng = np.random.default_rng(seed)

    def conv(i, o, k=1):
        fan = i * k * k
        return {
            "w": nrng.normal(0.0, 1.0 / math.sqrt(fan), size=(k, k, i, o)).astype(dtype),
            "b": np.zeros((o,), dtype),
        }

    def bottleneck(c):
        return {"cv1": conv(c, c, 3), "cv2": conv(c, c, 3)}

    def c2f(ci, co, n):
        c = co // 2
        return {
            "cv1": conv(ci, 2 * c, 1),
            "cv2": conv((2 + n) * c, co, 1),
            "m": [bottleneck(c) for _ in range(n)],
        }

    c1, c2, c3, c4, c5 = cfg.stage_channels
    n1 = cfg.depth(3)
    n2 = cfg.depth(6)

    backbone = {
        "stem": conv(3, c1, 3),
        "down2": conv(c1, c2, 3),
        "c2f2": c2f(c2, c2, n1),
        "down3": conv(c2, c3, 3),
        "c2f3": c2f(c3, c3, n2),
        "down4": conv(c3, c4, 3),
        "c2f4": c2f(c4, c4, n2),
        "down5": conv(c4, c5, 3),
        "c2f5": c2f(c5, c5, n1),
        "sppf": {"cv1": conv(c5, c5 // 2, 1), "cv2": conv(c5 * 2, c5, 1)},
    }
    head = {
        "c2f_up4": c2f(c5 + c4, c4, n1),
        "c2f_up3": c2f(c4 + c3, c3, n1),
        "down4": conv(c3, c3, 3),
        "c2f_down4": c2f(c3 + c4, c4, n1),
        "down5": conv(c4, c4, 3),
        "c2f_down5": c2f(c4 + c5, c5, n1),
    }
    bc = cfg.box_branch_ch
    cc = cfg.cls_branch_ch
    detect = [
        {
            "box1": conv(ci, bc, 3),
            "box2": conv(bc, bc, 3),
            "box3": conv(bc, 4 * cfg.reg_max, 1),
            "cls1": conv(ci, cc, 3),
            "cls2": conv(cc, cc, 3),
            "cls3": conv(cc, cfg.num_classes, 1),
        }
        for ci in cfg.detect_channels
    ]
    return {"backbone": backbone, "head": head, "detect": detect}
