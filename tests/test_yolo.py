"""YOLOv8 tests: block-level parity vs inline torch modules, decode oracle,
NMS oracle, converter round-trip.

ultralytics is not installed here, so block parity uses torch.nn modules
built inline with the exact YOLOv8 definitions; the converter is tested
against a synthetic ultralytics-style state dict with correct shapes.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax.numpy as jnp

from yolo_sam_inference_tpu.models.yolo import (
    convert_ultralytics_state_dict,
    decode_predictions,
    init_yolo_params,
    yolo_forward,
    yolov8n,
)
from yolo_sam_inference_tpu.models.yolo.convert import _fold_conv_bn
from yolo_sam_inference_tpu.models.yolo.model import _c2f, _conv, _sppf
from yolo_sam_inference_tpu.ops.nms import batched_nms


# ---------------------------------------------------------- torch reference blocks


class TConv(nn.Module):
    """ultralytics Conv: conv2d(no bias) + BN(eps=1e-3) + SiLU."""

    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(TBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


def _randomize_bn(module):
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0.0, 0.2)
                m.running_mean.normal_(0.0, 0.5)
                m.running_var.uniform_(0.5, 2.0)


def _conv_params_from_torch(tc: TConv) -> dict:
    sd = {"x.conv.weight": tc.conv.weight, "x.bn.weight": tc.bn.weight,
          "x.bn.bias": tc.bn.bias, "x.bn.running_mean": tc.bn.running_mean,
          "x.bn.running_var": tc.bn.running_var}
    return _fold_conv_bn(sd, "x")


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_conv_bn_silu_parity():
    torch.manual_seed(0)
    tc = TConv(8, 16, 3, 2).eval()
    _randomize_bn(tc)
    x = torch.randn(2, 8, 32, 32)
    with torch.no_grad():
        want = _nhwc(tc(x))
    got = np.asarray(_conv(_conv_params_from_torch(tc), jnp.asarray(_nhwc(x)), stride=2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_c2f_parity():
    torch.manual_seed(1)
    tm = TC2f(16, 16, n=2, shortcut=True).eval()
    _randomize_bn(tm)
    params = {
        "cv1": _conv_params_from_torch(tm.cv1),
        "cv2": _conv_params_from_torch(tm.cv2),
        "m": [
            {"cv1": _conv_params_from_torch(b.cv1), "cv2": _conv_params_from_torch(b.cv2)}
            for b in tm.m
        ],
    }
    x = torch.randn(2, 16, 16, 16)
    with torch.no_grad():
        want = _nhwc(tm(x))
    got = np.asarray(_c2f(params, jnp.asarray(_nhwc(x)), True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sppf_parity():
    torch.manual_seed(2)
    tm = TSPPF(32, 32).eval()
    _randomize_bn(tm)
    params = {
        "cv1": _conv_params_from_torch(tm.cv1),
        "cv2": _conv_params_from_torch(tm.cv2),
    }
    x = torch.randn(1, 32, 20, 20)
    with torch.no_grad():
        want = _nhwc(tm(x))
    got = np.asarray(_sppf(params, jnp.asarray(_nhwc(x))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------- decode and NMS


def test_decode_shapes_and_anchor_semantics():
    cfg = yolov8n()
    import jax

    params = init_yolo_params(jax.random.PRNGKey(0), cfg)
    imgs = jnp.zeros((1, 128, 128, 3), dtype=jnp.float32)
    outs = yolo_forward(params, imgs, cfg)
    assert [o.shape[1] for o in outs] == [16, 8, 4]
    boxes, scores = decode_predictions(outs, cfg)
    n = 16 * 16 + 8 * 8 + 4 * 4
    assert boxes.shape == (1, n, 4)
    assert scores.shape == (1, n, 1)
    # zero raw output -> dist = mean bin = 7.5, anchor center (0.5, 0.5)*stride
    np.testing.assert_allclose(
        np.asarray(boxes[0, 0]),
        [(0.5 - 7.5) * 8, (0.5 - 7.5) * 8, (0.5 + 7.5) * 8, (0.5 + 7.5) * 8],
        rtol=1e-5,
    )


def oracle_nms(boxes, scores, iou_th, conf_th):
    """Plain-python greedy NMS oracle."""
    order = np.argsort(-scores)
    kept = []
    for i in order:
        if scores[i] < conf_th:
            continue
        ok = True
        for j in kept:
            bi, bj = boxes[i], boxes[j]
            ix1, iy1 = max(bi[0], bj[0]), max(bi[1], bj[1])
            ix2, iy2 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            ai = (bi[2] - bi[0]) * (bi[3] - bi[1])
            aj = (bj[2] - bj[0]) * (bj[3] - bj[1])
            if inter / max(ai + aj - inter, 1e-9) > iou_th:
                ok = False
                break
        if ok:
            kept.append(i)
    return [boxes[i] for i in kept]


@pytest.mark.parametrize("seed", range(4))
def test_nms_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 100
    centers = rng.uniform(50, 450, size=(n, 2))
    sizes = rng.uniform(10, 60, size=(n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, size=n).astype(np.float32)

    out_boxes, out_scores, valid = batched_nms(
        jnp.asarray(boxes[None]), jnp.asarray(scores[None]),
        max_det=32, iou_threshold=0.5, conf_threshold=0.25,
    )
    got = np.asarray(out_boxes[0])[np.asarray(valid[0])]
    want = oracle_nms(boxes, scores, 0.5, 0.25)[:32]
    assert len(got) == len(want)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5)


def test_nms_respects_conf_threshold():
    boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], dtype=np.float32)
    scores = np.array([0.9, 0.1], dtype=np.float32)
    _, _, valid = batched_nms(
        jnp.asarray(boxes[None]), jnp.asarray(scores[None]), max_det=8,
        conf_threshold=0.25,
    )
    assert int(np.asarray(valid).sum()) == 1


# ------------------------------------------------------------------- converter


def _fake_ultralytics_state_dict(cfg):
    """Synthetic state dict with exact ultralytics shapes for yolov8n."""
    sd = {}
    g = torch.Generator().manual_seed(0)

    def conv(prefix, ci, co, k):
        sd[f"{prefix}.conv.weight"] = torch.randn(co, ci, k, k, generator=g) * 0.05
        sd[f"{prefix}.bn.weight"] = torch.rand(co, generator=g) + 0.5
        sd[f"{prefix}.bn.bias"] = torch.randn(co, generator=g) * 0.1
        sd[f"{prefix}.bn.running_mean"] = torch.randn(co, generator=g) * 0.1
        sd[f"{prefix}.bn.running_var"] = torch.rand(co, generator=g) + 0.5

    def c2f(prefix, ci, co, n):
        c = co // 2
        conv(f"{prefix}.cv1", ci, 2 * c, 1)
        conv(f"{prefix}.cv2", (2 + n) * c, co, 1)
        for i in range(n):
            conv(f"{prefix}.m.{i}.cv1", c, c, 3)
            conv(f"{prefix}.m.{i}.cv2", c, c, 3)

    c1, c2, c3, c4, c5 = cfg.stage_channels
    n1, n2 = cfg.depth(3), cfg.depth(6)
    conv("model.0", 3, c1, 3)
    conv("model.1", c1, c2, 3)
    c2f("model.2", c2, c2, n1)
    conv("model.3", c2, c3, 3)
    c2f("model.4", c3, c3, n2)
    conv("model.5", c3, c4, 3)
    c2f("model.6", c4, c4, n2)
    conv("model.7", c4, c5, 3)
    c2f("model.8", c5, c5, n1)
    conv("model.9.cv1", c5, c5 // 2, 1)
    conv("model.9.cv2", c5 * 2, c5, 1)
    c2f("model.12", c5 + c4, c4, n1)
    c2f("model.15", c4 + c3, c3, n1)
    conv("model.16", c3, c3, 3)
    c2f("model.18", c3 + c4, c4, n1)
    conv("model.19", c4, c4, 3)
    c2f("model.21", c4 + c5, c5, n1)
    bc, cc = cfg.box_branch_ch, cfg.cls_branch_ch
    for lvl, ci in enumerate(cfg.detect_channels):
        conv(f"model.22.cv2.{lvl}.0", ci, bc, 3)
        conv(f"model.22.cv2.{lvl}.1", bc, bc, 3)
        sd[f"model.22.cv2.{lvl}.2.weight"] = torch.randn(4 * cfg.reg_max, bc, 1, 1, generator=g) * 0.05
        sd[f"model.22.cv2.{lvl}.2.bias"] = torch.randn(4 * cfg.reg_max, generator=g) * 0.1
        conv(f"model.22.cv3.{lvl}.0", ci, cc, 3)
        conv(f"model.22.cv3.{lvl}.1", cc, cc, 3)
        sd[f"model.22.cv3.{lvl}.2.weight"] = torch.randn(cfg.num_classes, cc, 1, 1, generator=g) * 0.05
        sd[f"model.22.cv3.{lvl}.2.bias"] = torch.randn(cfg.num_classes, generator=g) * 0.1
    return sd


def test_converter_builds_runnable_params():
    cfg = yolov8n()
    sd = _fake_ultralytics_state_dict(cfg)
    params = convert_ultralytics_state_dict(sd, cfg)
    imgs = jnp.asarray(np.random.default_rng(0).random((1, 128, 128, 3)), dtype=jnp.float32)
    outs = yolo_forward(params, imgs, cfg)
    boxes, scores = decode_predictions(outs, cfg)
    assert np.isfinite(np.asarray(boxes)).all()
    assert np.isfinite(np.asarray(scores)).all()
    # parity of init-param tree structure with converted tree
    import jax

    init = init_yolo_params(jax.random.PRNGKey(0), cfg)
    t1 = jax.tree_util.tree_structure(init)
    t2 = jax.tree_util.tree_structure(params)
    assert t1 == t2
    for a, b in zip(jax.tree_util.tree_leaves(init), jax.tree_util.tree_leaves(params)):
        assert a.shape == np.asarray(b).shape


def test_fold_conv_bn_math():
    torch.manual_seed(3)
    tc = TConv(4, 6, 3).eval()
    _randomize_bn(tc)
    p = _conv_params_from_torch(tc)
    x = torch.randn(1, 4, 8, 8)
    with torch.no_grad():
        want = tc.bn(tc.conv(x))  # pre-activation
    got = np.asarray(
        _conv(p, jnp.asarray(_nhwc(x)), act=False)
    )
    np.testing.assert_allclose(got, _nhwc(want), rtol=1e-4, atol=1e-5)


def test_load_yolo_params_pickle_gated(tmp_path):
    """A checkpoint that fails weights_only=True must NOT be silently
    unpickled: the unsafe path requires an explicit allow_pickle=True."""
    import pytest

    from yolo_sam_inference_tpu.models.yolo.convert import load_yolo_params

    import os

    cfg = yolov8n()
    path = tmp_path / "evil.pt"
    # a pickled function reference is rejected by weights_only=True
    torch.save({"model": os.system}, path)
    with pytest.raises(ValueError, match="allow_pickle"):
        load_yolo_params(str(path), cfg)


def test_load_yolo_params_state_dict_roundtrip(tmp_path):
    """A plain state-dict checkpoint loads via the safe path (no pickle)."""
    cfg = yolov8n()
    sd = _fake_ultralytics_state_dict(cfg)
    path = tmp_path / "sd.pt"
    torch.save(sd, path)
    from yolo_sam_inference_tpu.models.yolo.convert import load_yolo_params

    import jax

    params = load_yolo_params(str(path), cfg)
    imgs = jnp.asarray(np.zeros((1, 128, 128, 3), dtype=np.float32))
    outs = yolo_forward(params, imgs, cfg)
    assert all(np.isfinite(np.asarray(o)).all() for o in jax.tree_util.tree_leaves(outs))


def test_s2d_backbone_prefix_matches_native():
    """Space-to-depth rewrite of stem..down4 is exactly the native prefix."""
    import jax.numpy as jnp

    from yolo_sam_inference_tpu.models.yolo import init_yolo_params, yolov8n
    from yolo_sam_inference_tpu.models.yolo.model import _c2f, _conv, yolo_forward
    from yolo_sam_inference_tpu.models.yolo.s2d import (
        backbone_prefix_s2d,
        depth_to_space,
        transform_backbone_params,
    )

    cfg = yolov8n()
    params = init_yolo_params(7, cfg)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)

    b = params["backbone"]
    h = _conv(b["stem"], x, stride=2)
    h = _conv(b["down2"], h, stride=2)
    h = _c2f(b["c2f2"], h, True)
    h = _conv(b["down3"], h, stride=2)
    p3_ref = _c2f(b["c2f3"], h, True)
    x4_ref = _conv(b["down4"], p3_ref, stride=2)

    s2d = transform_backbone_params(params)
    p3s, x4 = backbone_prefix_s2d(s2d, x)
    p3 = depth_to_space(p3s)
    np.testing.assert_allclose(np.asarray(p3), np.asarray(p3_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(x4), np.asarray(x4_ref), rtol=2e-5, atol=2e-5)

    # and through the full forward (head + detect unchanged)
    outs_ref = yolo_forward(params, x, cfg)
    outs_s2d = yolo_forward(params, x, cfg, s2d_params=s2d)
    for a, bb in zip(outs_ref, outs_s2d):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a), rtol=2e-5, atol=2e-5)


def test_s2d_uint8_input_matches_normalized():
    """s2d prefix on raw uint8 == native forward on images/255."""
    import jax.numpy as jnp

    from yolo_sam_inference_tpu.models.yolo import init_yolo_params, yolov8n
    from yolo_sam_inference_tpu.models.yolo.model import yolo_forward
    from yolo_sam_inference_tpu.models.yolo.s2d import transform_backbone_params

    cfg = yolov8n()
    params = init_yolo_params(3, cfg)
    s2d = transform_backbone_params(params)
    rng = np.random.default_rng(4)
    img_u8 = rng.integers(0, 255, size=(2, 64, 64, 3), dtype=np.uint8)
    want = yolo_forward(params, jnp.asarray(img_u8, jnp.float32) / 255.0, cfg)
    got = yolo_forward(params, jnp.asarray(img_u8), cfg, s2d_params=s2d)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-5, atol=3e-5)
