"""Full-graph YOLOv8n parity: a complete torch model with ultralytics module
naming vs our JAX forward fed through the state-dict converter.

This validates the converter's layer-index wiring (the 0..22 yaml map) and
the PAN head topology end to end — the block-level tests in test_yolo.py
cannot catch crossed skip connections.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax.numpy as jnp

from yolo_sam_inference_tpu.models.yolo import (
    convert_ultralytics_state_dict,
    yolo_forward,
    yolov8n,
)

from test_yolo import TC2f, TConv, TSPPF, _randomize_bn


class TDetect(nn.Module):
    """ultralytics Detect head (cv2 = box branch, cv3 = cls branch)."""

    def __init__(self, channels, reg_max, nc, bc, cc):
        super().__init__()
        self.cv2 = nn.ModuleList(
            nn.Sequential(TConv(ci, bc, 3), TConv(bc, bc, 3), nn.Conv2d(bc, 4 * reg_max, 1))
            for ci in channels
        )
        self.cv3 = nn.ModuleList(
            nn.Sequential(TConv(ci, cc, 3), TConv(cc, cc, 3), nn.Conv2d(cc, nc, 1))
            for ci in channels
        )

    def forward(self, feats):
        return [
            torch.cat((self.cv2[i](f), self.cv3[i](f)), 1) for i, f in enumerate(feats)
        ]


class TYolo(nn.Module):
    """YOLOv8n with the exact ultralytics module indices (model.0 .. model.22)."""

    def __init__(self, cfg):
        super().__init__()
        c1, c2, c3, c4, c5 = cfg.stage_channels
        n1, n2 = cfg.depth(3), cfg.depth(6)
        m = nn.ModuleDict()
        m["0"] = TConv(3, c1, 3, 2)
        m["1"] = TConv(c1, c2, 3, 2)
        m["2"] = TC2f(c2, c2, n1, True)
        m["3"] = TConv(c2, c3, 3, 2)
        m["4"] = TC2f(c3, c3, n2, True)
        m["5"] = TConv(c3, c4, 3, 2)
        m["6"] = TC2f(c4, c4, n2, True)
        m["7"] = TConv(c4, c5, 3, 2)
        m["8"] = TC2f(c5, c5, n1, True)
        m["9"] = TSPPF(c5, c5)
        m["12"] = TC2f(c5 + c4, c4, n1, False)
        m["15"] = TC2f(c4 + c3, c3, n1, False)
        m["16"] = TConv(c3, c3, 3, 2)
        m["18"] = TC2f(c3 + c4, c4, n1, False)
        m["19"] = TConv(c4, c4, 3, 2)
        m["21"] = TC2f(c4 + c5, c5, n1, False)
        m["22"] = TDetect(
            cfg.detect_channels, cfg.reg_max, cfg.num_classes,
            cfg.box_branch_ch, cfg.cls_branch_ch,
        )
        self.model = m
        self.up = nn.Upsample(scale_factor=2, mode="nearest")

    def forward(self, x):
        m = self.model
        x = m["1"](m["0"](x))
        x = m["2"](x)
        p3 = m["4"](m["3"](x))
        p4 = m["6"](m["5"](p3))
        p5 = m["9"](m["8"](m["7"](p4)))
        f4 = m["12"](torch.cat([self.up(p5), p4], 1))
        f3 = m["15"](torch.cat([self.up(f4), p3], 1))
        g4 = m["18"](torch.cat([m["16"](f3), f4], 1))
        g5 = m["21"](torch.cat([m["19"](g4), p5], 1))
        return m["22"]([f3, g4, g5])


def test_full_yolo_graph_parity():
    cfg = yolov8n()
    torch.manual_seed(0)
    tm = TYolo(cfg).eval()
    _randomize_bn(tm)

    sd = {f"model.{k}": v for k, v in tm.model.state_dict().items()}
    params = convert_ultralytics_state_dict(sd, cfg)

    rng = np.random.default_rng(0)
    x = rng.random((1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = yolo_forward(params, jnp.asarray(x), cfg)

    assert len(got) == len(want) == 3
    for lvl, (g, w) in enumerate(zip(got, want)):
        w_nhwc = w.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(g), w_nhwc, rtol=5e-3, atol=5e-4,
            err_msg=f"level {lvl}",
        )


# heavy suite (torch parity / e2e pipeline / 8-device mesh): run the
# quick loop with `pytest -m "not slow" tests/`
pytestmark = pytest.mark.slow
