"""The TPU batch pipeline engine: YOLO detect -> SAM segment -> metrics.

TPU-first re-design of the reference ``CellSegmentationPipeline``
(reference ``pipeline.py:47-263``). Structural changes versus the reference:

* **One jitted program per image batch** instead of per-image host loops:
  letterbox + YOLO + NMS + SAM preprocess + ViT encoder + prompt/mask decoder
  + mask cropping + all 16 morphometrics execute on device with static
  shapes. The reference re-ran the full SAM ViT encoder once per detected box
  (``pipeline.py:105-110`` inside the loop at ``:170``); here the encoder
  runs once per image and the decoder is batched over all padded boxes.
* **Ragged detections -> padded tensors + validity masks** (max_det), so no
  host round trips per image/box.
* **Stage-jitted or fully-fused execution**: ``process_batch_arrays`` runs
  four jitted stages so the reference's per-stage timing schema
  (``pipeline.py:271-284``) reports real device timings; ``fused_call``
  compiles the whole thing into one XLA program for maximum throughput
  (used by bench.py and the direct ndarray API).
* Mask logits are sampled directly from SAM's low-res output onto a fixed
  per-cell crop window at original-image resolution (one bilinear gather),
  instead of the reference's 256->1024->original double interpolation
  (``pipeline.py:113-123``) — same masks to within interpolation rounding.

Weights load from checkpoints when provided (``yolo_model_path``,
``sam_checkpoint``); otherwise parameters are randomly initialized (this
environment ships no pretrained weights) — the pipeline remains fully
functional for throughput/e2e work and unit parity is covered in tests.
"""

from __future__ import annotations

import functools
import math
import os
import time
import uuid
from dataclasses import dataclass
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models.sam import (
    SamTPUConfig,
    init_sam_params,
    sam_image_encoder,
    sam_mask_decoder,
    sam_prompt_boxes,
    sam_vit_b,
    sam_vit_h,
    sam_vit_l,
)
from ..models.yolo import (
    YoloConfig,
    decode_predictions,
    init_yolo_params,
    yolo_forward,
    yolov8n,
)
from ..ops.metrics import METRIC_KEYS, batched_cell_metrics
from ..ops.nms import batched_nms
from ..ops.preprocess import letterbox_batch, sam_preprocess_batch
from ..io.images import list_image_files, load_image
from ..utils.logger import setup_logger
from .results import (
    BatchProcessingResult,
    ProcessingResult,
    collect_metrics_data,
    collect_timing_data,
    initialize_timing_dict,
    update_total_timing,
)

logger = setup_logger(__name__)

SAM_CONFIGS = {
    "facebook/sam-vit-base": sam_vit_b,
    "facebook/sam-vit-large": sam_vit_l,
    "facebook/sam-vit-huge": sam_vit_h,
    "vit-base": sam_vit_b,
    "vit-large": sam_vit_l,
    "vit-huge": sam_vit_h,
    # MobileSAM: TinyViT-5M encoder + the standard SAM prompt/mask decoder
    "mobile-sam": sam_vit_b,
    "tinyvit": sam_vit_b,
}

TINYVIT_TYPES = ("mobile-sam", "tinyvit")

INT_METRIC_KEYS = (
    "area",
    "convex_hull_area",
    "mask_x_length",
    "mask_y_length",
    "min_x",
    "min_y",
    "max_x",
    "max_y",
)


@dataclass(frozen=True)
class PipelineOptions:
    """Static engine knobs (everything that shapes the compiled program)."""

    batch_size: int = 8
    max_det: int = 24
    metric_crop: int = 128
    conf_threshold: float = 0.25
    iou_threshold: float = 0.7
    nms_candidates: int = 256
    # YOLO letterbox canvas: None = native (max(H, W) rounded up to a
    # 32-multiple, capped at 640) — avoids upscaling small frames to the
    # 640 training canvas. Set 640 to force ultralytics-default behavior.
    yolo_size: Optional[int] = None
    num_hull_directions: int = 256
    # "polygon" = exact hull polygon measures (default); "reference" =
    # rasterize-and-remeasure parity with the reference's procedure
    # (see ops/metrics.py:rasterized_hull_measures for the measured delta)
    hull_mode: str = "polygon"
    compute_dtype: Any = jnp.bfloat16  # encoder/decoder activations on TPU
    # SAM encoder canvas: None = native resolution (smallest of 256/512/768/
    # 1024 that fits the image) — the main TPU throughput lever; weights are
    # resolution-adapted at load time (models/sam/convert.adapt_resolution).
    # Set 1024 to force the reference's fixed canvas.
    sam_encoder_size: Optional[int] = None
    # "int8" = dynamic w8a8 quantization of the SAM ViT encoder's qkv/MLP
    # projections (2x MXU rate on TPU; the single-chip lever for ViT-L/H,
    # whose weights exceed the VMEM-resident kernel budget). Default off:
    # exact bf16 numerics. See ops/quant.py for the scheme + error bounds.
    quant: str = "none"
    # TinyViT (MobileSAM) opt-in perf experiments (device measurement
    # pending — gated off by default until benched):
    # "bf16" runs the MBConv kernel's VPU-bound GELU/depthwise stretch in
    # the activation dtype (packed-bf16 VPU issue is 2x the fp32 rate);
    # error bound tested in tests/test_tinyvit.py.
    tinyvit_mbconv_compute: str = "fp32"
    # exact-equivalent s2d rewrite of the two narrow patch-embed stems
    # (same transform as the YOLO backbone prefix, models/yolo/s2d.py)
    tinyvit_stem_s2d: bool = False
    # Shard the SAM ViT encoder's compute over the mesh, cutting per-image
    # encoder latency ~n-fold (the ViT-L/H lever the reference cannot
    # express — it only thread-replicates whole models, pipeline.py:440-467):
    # "tp" = Megatron head/MLP-hidden weight sharding over the mesh's 'tp'
    # axis (parallel/tp.py), "sp" = row-wise sequence sharding over 'sp'
    # (parallel/sp.py). Requires ``mesh`` with the named axis plus a 'dp'
    # axis (size 1 is fine: make_mesh(dp=1, tp=8) / make_mesh_axes(dp=1,
    # sp=4)); ViT encoders only. Inference runs stage-composed (the encoder
    # dominates these configs, so cross-stage fusion is immaterial).
    encoder_parallel: str = "none"

    def encoder_size_for(self, h: int, w: int) -> int:
        if self.sam_encoder_size is not None:
            return self.sam_encoder_size
        m = max(h, w)
        for size in (256, 512, 768, 1024):
            if m <= size:
                return size
        return 1024

    def yolo_size_for(self, h: int, w: int) -> int:
        if self.yolo_size is not None:
            return self.yolo_size
        return min(640, ((max(h, w) + 31) // 32) * 32)


# ------------------------------------------------------------ stage functions
# Pure functions of (params, arrays); the engine jits them per input shape.


def _ensure_rgb(images_u8: jnp.ndarray) -> jnp.ndarray:
    """Accept (B, H, W) grayscale or (B, H, W, 3) RGB batches.

    Microscopy frames are usually single-channel stored as replicated RGB;
    the engine transfers them host->device as one channel (3x fewer bytes on
    the PCIe/tunnel link — the e2e pipeline's measured bottleneck) and
    broadcasts back to RGB on device, where bandwidth is ample.
    """
    if images_u8.ndim == 3:
        return jnp.broadcast_to(images_u8[..., None], (*images_u8.shape, 3))
    return images_u8


def detect_stage(
    yolo_params, images_u8: jnp.ndarray, ycfg: YoloConfig, opts: PipelineOptions,
    yolo_s2d=None,
):
    """uint8 (B, H, W[, 3]) -> boxes xyxy in original pixels, scores, valid."""
    images_u8 = _ensure_rgb(images_u8)
    h0, w0 = images_u8.shape[1], images_u8.shape[2]
    ysize = opts.yolo_size_for(h0, w0)
    if yolo_s2d is not None and h0 == w0 == ysize:
        # identity letterbox: skip the bf16 canvas entirely — the s2d prefix
        # transposes the raw uint8 batch (1/4 the bytes) and fuses /255 into
        # the stem conv
        scale, pad_x, pad_y = 1.0, 0.0, 0.0
        outs = yolo_forward(yolo_params, images_u8, ycfg, s2d_params=yolo_s2d)
    else:
        lb, scale, (pad_x, pad_y) = letterbox_batch(images_u8, ysize)
        # params arrive pre-cast to compute_dtype (once, outside jit);
        # decode/NMS stay fp32
        outs = yolo_forward(
            yolo_params, lb.astype(opts.compute_dtype), ycfg, s2d_params=yolo_s2d
        )
    boxes, scores = decode_predictions(outs, ycfg)
    scores = scores.max(axis=-1)  # single-class cell detector
    boxes, scores, valid = batched_nms(
        boxes,
        scores,
        max_det=opts.max_det,
        iou_threshold=opts.iou_threshold,
        conf_threshold=opts.conf_threshold,
        num_candidates=opts.nms_candidates,
    )
    # letterbox -> original coords
    h, w = images_u8.shape[1], images_u8.shape[2]
    shift = jnp.asarray([pad_x, pad_y, pad_x, pad_y], dtype=boxes.dtype)
    boxes = (boxes - shift) / scale
    lim = jnp.asarray([w - 1, h - 1, w - 1, h - 1], dtype=boxes.dtype)
    boxes = jnp.clip(boxes, 0.0, lim)
    boxes = jnp.where(valid[..., None], boxes, 0.0)
    return boxes, scores, valid


def _gray_f32(images_u8: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W[, 3]) uint8 -> (B, H, W) fp32 channel-mean brightness."""
    if images_u8.ndim == 3:
        return images_u8.astype(jnp.float32)
    return images_u8.astype(jnp.float32).mean(axis=-1)


_gray_jit = jax.jit(_gray_f32)


def _pack_csv_outputs(boxes, scores, valid, offs, mets):
    """Concatenate every CSV-needed per-detection output into one fp32
    (B, K, 8 + M) tensor: [boxes(4), scores(1), valid(1), offsets(2),
    metrics(M) in sorted-key order]. One device->host transfer then covers
    the whole CSV row set — each separate transfer pays a fixed round-trip
    latency on the tunneled link, and the dominant leg of the CSV-only
    directory path was ~21 small fetches per batch. All fields are exactly
    representable in fp32 (coordinates < 2^24; metrics are fp32 already)."""
    f32 = lambda a: a.astype(jnp.float32)
    parts = [f32(boxes), f32(scores)[..., None], f32(valid)[..., None], f32(offs)]
    parts += [f32(mets[k])[..., None] for k in sorted(mets)]
    return jnp.concatenate(parts, axis=-1)


def _cast_floating(tree, dtype):
    """Cast floating leaves (device OR host-numpy — init trees stay numpy
    so the cast is a free host op, not ~500 eager device dispatches)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if isinstance(x, (jnp.ndarray, np.ndarray))
        and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def _device_put_packed(tree):
    """Upload a (mostly numpy) pytree in ONE host->device transfer per dtype.

    Per-leaf ``jnp.asarray`` pays a fixed round-trip on the tunneled TPU
    backend (~100 ms x ~500 leaves = the 52 s "pipeline init" phase in the
    r3u bench log). Instead: concatenate all same-dtype leaves into one flat
    host buffer, transfer it once, and split it back into per-leaf device
    arrays inside a single jitted program (slice boundaries are static, so
    the unpack compiles once per tree signature and persistent-caches).
    Leaves that are already device arrays pass through untouched.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    by_dtype: Dict[Any, list] = {}
    for i, x in enumerate(leaves):
        if isinstance(x, np.ndarray) and not isinstance(x, jnp.ndarray):
            by_dtype.setdefault(np.dtype(x.dtype), []).append(i)
    for dt, idxs in by_dtype.items():
        flat = np.concatenate([leaves[i].reshape(-1) for i in idxs])
        shapes = tuple(leaves[i].shape for i in idxs)
        parts = _packed_unpack(shapes, str(dt))(jnp.asarray(flat))
        for i, p in zip(idxs, parts):
            leaves[i] = p
    return jax.tree_util.tree_unflatten(treedef, leaves)


@functools.lru_cache(maxsize=32)
def _packed_unpack(shapes, dtype_str):
    del dtype_str  # cache key only (buffer dtype distinguishes the jit)
    offs = np.cumsum([0] + [int(np.prod(s, dtype=np.int64)) for s in shapes])

    def unpack(buf):
        return tuple(
            jax.lax.slice(buf, (int(offs[j]),), (int(offs[j + 1]),)).reshape(s)
            for j, s in enumerate(shapes)
        )

    return jax.jit(unpack)


def embed_stage(
    sam_params, images_u8: jnp.ndarray, scfg: SamTPUConfig, opts: PipelineOptions
):
    """uint8 (B, H, W[, 3]) -> SAM image embeddings (B, gs, gs, C)."""
    pix, _, _ = sam_preprocess_batch(_ensure_rgb(images_u8), scfg.image_size)
    pix = pix.astype(opts.compute_dtype)
    if "tinyvit" in sam_params:
        from ..models.sam.tinyvit import TinyViTConfig, tinyvit_encoder

        tcfg = TinyViTConfig(
            image_size=scfg.image_size, output_channels=scfg.output_channels
        )
        emb = tinyvit_encoder(
            sam_params["tinyvit"], pix, tcfg,
            mbconv_compute=opts.tinyvit_mbconv_compute,
        )
    else:
        emb = sam_image_encoder({"vision": sam_params["vision"]}, pix, scfg)
    return emb.astype(jnp.float32)


def _bilinear_crop_sample(
    lowres: jnp.ndarray, offset_rc: jnp.ndarray, crop: int, scale_to_low: float
) -> jnp.ndarray:
    """Sample (crop, crop) original-resolution logits from a low-res map.

    lowres: (L, L) logits covering the SAM square input. Original pixel
    (r, c) maps to low-res coords ((r + 0.5) * s - 0.5) with
    s = scale_to_low = (sam_size / max(H, W)) / 4.

    Gather-free: dynamic_slice the cell's low-res window (fast on TPU), then
    apply separable hat-function interpolation matrices built on the fly —
    two small matmuls per cell instead of six gathers (element gathers are
    pathologically slow on the TPU vector units).
    """
    L = lowres.shape[-1]
    win = min(L, int(math.ceil(crop * scale_to_low)) + 2)
    idx = jnp.arange(crop, dtype=jnp.float32)
    ly = (offset_rc[0].astype(jnp.float32) + idx + 0.5) * scale_to_low - 0.5
    lx = (offset_rc[1].astype(jnp.float32) + idx + 0.5) * scale_to_low - 0.5
    ly = jnp.clip(ly, 0.0, L - 1.0)
    lx = jnp.clip(lx, 0.0, L - 1.0)

    y_start = jnp.clip(jnp.floor(ly[0]).astype(jnp.int32), 0, L - win)
    x_start = jnp.clip(jnp.floor(lx[0]).astype(jnp.int32), 0, L - win)
    window = jax.lax.dynamic_slice(lowres, (y_start, x_start), (win, win))

    j = jnp.arange(win, dtype=jnp.float32)
    # hat-function weights: P[i, j] = max(0, 1 - |l_i - (start + j)|)
    py = jnp.maximum(
        0.0, 1.0 - jnp.abs(ly[:, None] - (y_start.astype(jnp.float32) + j[None, :]))
    )  # (crop, win)
    px = jnp.maximum(
        0.0, 1.0 - jnp.abs(lx[:, None] - (x_start.astype(jnp.float32) + j[None, :]))
    )
    return jnp.einsum(
        "iw,wv,jv->ij", py, window, px, preferred_element_type=jnp.float32
    )


def _bilinear_crop_sample_window(
    win_logits: jnp.ndarray,
    offset_rc: jnp.ndarray,
    win_low_start: jnp.ndarray,
    crop: int,
    scale_to_low: float,
) -> jnp.ndarray:
    """Like :func:`_bilinear_crop_sample`, but over a pre-sliced low-res
    window whose global low-res origin is ``win_low_start`` (row, col)."""
    lw = win_logits.shape[-1]
    idx = jnp.arange(crop, dtype=jnp.float32)
    ly = (offset_rc[0].astype(jnp.float32) + idx + 0.5) * scale_to_low - 0.5
    lx = (offset_rc[1].astype(jnp.float32) + idx + 0.5) * scale_to_low - 0.5
    ly = jnp.clip(ly - win_low_start[0].astype(jnp.float32), 0.0, lw - 1.0)
    lx = jnp.clip(lx - win_low_start[1].astype(jnp.float32), 0.0, lw - 1.0)
    j = jnp.arange(lw, dtype=jnp.float32)
    py = jnp.maximum(0.0, 1.0 - jnp.abs(ly[:, None] - j[None, :]))  # (crop, lw)
    px = jnp.maximum(0.0, 1.0 - jnp.abs(lx[:, None] - j[None, :]))
    return jnp.einsum(
        "iw,wv,jv->ij", py, win_logits.astype(jnp.float32), px,
        preferred_element_type=jnp.float32,
    )


def segment_stage(
    sam_params,
    embeddings: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    image_hw: Tuple[int, int],
    scfg: SamTPUConfig,
    opts: PipelineOptions,
):
    """Embeddings + boxes -> per-cell boolean mask crops + crop offsets.

    Returns (mask_crops (B, K, Cm, Cm) bool, offsets (B, K, 2) int32).
    """
    from ..models.sam.model import sam_mask_decoder_tokens, sam_mask_head

    h, w = image_hw
    b, k = boxes.shape[0], boxes.shape[1]
    cm = min(opts.metric_crop, h, w)
    gs = scfg.grid_size
    sam_scale = scfg.image_size / max(h, w)

    sam_boxes = boxes * sam_scale
    # params arrive pre-cast; decoder activations run in compute_dtype with
    # fp32 LN/softmax inside
    sparse = sam_prompt_boxes(sam_params, sam_boxes, scfg).astype(opts.compute_dtype)
    iou, hyper, keys_grid = sam_mask_decoder_tokens(
        sam_params, embeddings.astype(opts.compute_dtype), sparse, scfg
    )
    hyper1 = hyper[:, :1, :]  # single-mask output (multimask_output=False)

    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    off_r = jnp.clip(jnp.round(cy).astype(jnp.int32) - cm // 2, 0, h - cm)
    off_c = jnp.clip(jnp.round(cx).astype(jnp.int32) - cm // 2, 0, w - cm)
    offsets = jnp.stack([off_r, off_c], axis=-1)  # (B, K, 2)

    scale_to_low = sam_scale / (scfg.image_size / scfg.low_res_size)

    # Windowed mask head: each prompt's mask is only needed inside its
    # metric-crop window, so slice the (gs, gs) token grid to a per-prompt
    # window and upscale just that — the full 4gs x 4gs map per prompt was
    # the decoder's dominant memory traffic (e.g. 537 MB tensors at B=32).
    scale_to_grid = scale_to_low / 4.0
    wg = min(gs, int(math.ceil(cm * scale_to_grid)) + 3)
    flat_off = offsets.reshape(b * k, 2)
    g_start_r = jnp.clip(
        (flat_off[:, 0].astype(jnp.float32) * scale_to_grid).astype(jnp.int32) - 1,
        0, gs - wg,
    )
    g_start_c = jnp.clip(
        (flat_off[:, 1].astype(jnp.float32) * scale_to_grid).astype(jnp.int32) - 1,
        0, gs - wg,
    )
    if jax.default_backend() != "cpu" and os.environ.get(
        "SAM_WINDOW_CROP", "1"
    ) == "1":
        # vmap(dynamic_slice) lowers to a gather that anchors a
        # batch-second-minor layout on keys_grid — a full relayout copy of
        # the i2t custom-call output (3.26 ms/iter at bench shape, the
        # r5a trace's largest copy). The pallas crop reads the native
        # layout (ops/window_crop.py; device-proven r5s c2 leg).
        # SAM_WINDOW_CROP=0 reverts to the gather path.
        from ..ops.window_crop import window_crop

        windows = window_crop(keys_grid, g_start_r, g_start_c, wg)
    else:
        windows = jax.vmap(
            lambda grid, r0, c0: jax.lax.dynamic_slice(
                grid, (r0, c0, 0), (wg, wg, grid.shape[-1])
            )
        )(keys_grid, g_start_r, g_start_c)  # (B*K, wg, wg, C)
    logits_win = sam_mask_head(sam_params, windows, hyper1)[:, 0]  # (B*K, 4wg, 4wg)

    # crop-sample at original resolution, with coords relative to the window
    win_low_start = jnp.stack([g_start_r * 4, g_start_c * 4], axis=-1)  # (B*K, 2)
    sample = functools.partial(
        _bilinear_crop_sample_window, crop=cm, scale_to_low=scale_to_low
    )
    crops = jax.vmap(sample)(logits_win, flat_off, win_low_start)
    crops = crops.reshape(b, k, cm, cm)
    mask_crops = (crops > 0.0) & valid[..., None, None]
    return mask_crops, offsets


def metrics_stage(
    mask_crops: jnp.ndarray,
    offsets: jnp.ndarray,
    gray: jnp.ndarray,
    image_hw: Tuple[int, int],
    opts: PipelineOptions,
):
    """(B, K, cm, cm) crops -> dict of (B, K) metric arrays."""
    fn = functools.partial(
        batched_cell_metrics,
        image_shape=image_hw,
        num_directions=opts.num_hull_directions,
        hull_mode=opts.hull_mode,
    )
    return jax.vmap(lambda m, g, o: fn(m, g, offsets=o))(mask_crops, gray, offsets)


# ------------------------------------------------------------------- the engine


class CellSegmentationPipeline:
    """YOLO + SAM + morphometrics pipeline (API parity with reference
    ``CellSegmentationPipeline``, ``pipeline.py:47``)."""

    def __init__(
        self,
        yolo_model_path: Optional[Union[str, Path]] = None,
        sam_model_type: str = "facebook/sam-vit-base",
        device: Optional[str] = None,  # accepted for API parity; JAX picks the backend
        sam_checkpoint: Optional[Union[str, Path]] = None,
        options: Optional[PipelineOptions] = None,
        seed: int = 0,
        sam_config: Optional[SamTPUConfig] = None,
        yolo_config: Optional[YoloConfig] = None,
        mesh: Optional[Any] = None,
    ) -> None:
        """``mesh``: an optional ``jax.sharding.Mesh`` (e.g. from
        ``parallel.mesh.make_mesh``). When given, inference runs data-parallel:
        the image batch is sharded over the mesh's 'dp' axis (padded to a dp
        multiple), weights are replicated, and XLA compiles one SPMD program —
        the TPU-native replacement for the reference's thread-replica pool
        (reference ``pipeline.py:440-467``, one model copy per thread)."""
        self.sam_model_type = sam_model_type
        self.mesh = mesh
        if mesh is not None:
            if "dp" in mesh.axis_names:
                self._dp = int(mesh.shape["dp"])
            else:  # no named dp axis: shard over the first axis
                self._dp = int(mesh.devices.shape[0])
        self.options = options or PipelineOptions()
        self.yolo_config = yolo_config or yolov8n()
        if sam_config is not None:
            self.sam_config = sam_config
        elif sam_model_type in SAM_CONFIGS:
            self.sam_config = SAM_CONFIGS[sam_model_type]()
        else:
            raise ValueError(f"unknown SAM model type: {sam_model_type}")
        self.device = device or jax.default_backend()
        self._initialize_models(yolo_model_path, sam_checkpoint, seed)
        self.run_id = self._generate_run_id()
        self._stage_cache: Dict[Tuple, Any] = {}

    # -- model loading -------------------------------------------------------

    def _initialize_models(self, yolo_path, sam_ckpt, seed: int) -> None:
        # plain int sub-seeds: jax.random.PRNGKey/split are DEVICE ops —
        # two compiles + transfers through the tunnel before any real work
        # (init stays host-side end to end; see _device_put_packed)
        ry, rs = 2 * seed, 2 * seed + 1
        if yolo_path and Path(yolo_path).exists():
            from ..models.yolo import load_yolo_params

            logger.info("Loading YOLO weights from %s", yolo_path)
            self.yolo_params = jax.tree_util.tree_map(
                jnp.asarray, load_yolo_params(str(yolo_path), self.yolo_config)
            )
        else:
            if yolo_path:
                logger.warning("YOLO checkpoint %s not found; using random init", yolo_path)
            self.yolo_params = init_yolo_params(ry, self.yolo_config)
        if sam_ckpt and Path(sam_ckpt).exists():
            from ..models.sam.convert import load_sam_params

            logger.info("Loading SAM weights from %s", sam_ckpt)
            self.sam_params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x) if x is not None else None,
                load_sam_params(str(sam_ckpt), self.sam_config),
                is_leaf=lambda x: x is None or not isinstance(x, dict),
            )
        else:
            if sam_ckpt:
                logger.warning("SAM checkpoint %s not found; using random init", sam_ckpt)
            self.sam_params = init_sam_params(rs, self.sam_config)
        if self.sam_model_type in TINYVIT_TYPES and "tinyvit" not in self.sam_params:
            from ..models.sam.tinyvit import TinyViTConfig, init_tinyvit_params

            tcfg = TinyViTConfig(
                image_size=self.sam_config.image_size,
                output_channels=self.sam_config.output_channels,
            )
            self.sam_params = dict(self.sam_params)
            self.sam_params["tinyvit"] = init_tinyvit_params(seed + 1, tcfg)
            self.sam_params.pop("vision", None)  # ViT encoder replaced

    @staticmethod
    def _generate_run_id() -> str:
        return f"{datetime.now().strftime('%Y%m%d_%H%M%S')}_{uuid.uuid4().hex[:8]}"

    # -- compiled stage accessors ---------------------------------------------

    def _sam_params_for(self, scfg: SamTPUConfig):
        """Resolution-adapted SAM params (cached per encoder size)."""
        key = (scfg.image_size, scfg.window_size)
        base = (self.sam_config.image_size, self.sam_config.window_size)
        if key == base or "vision" not in self.sam_params:
            # TinyViT has no resolution-dependent weights (windowed biases only)
            return self.sam_params
        if not hasattr(self, "_adapted_params"):
            self._adapted_params = {}
        if key not in self._adapted_params:
            from ..models.sam.convert import adapt_resolution

            self._adapted_params[key] = adapt_resolution(self.sam_params, scfg)
        return self._adapted_params[key]

    def _stages(self, h: int, w: int):
        """jitted stage functions specialized for image shape (h, w)."""
        key = (h, w)
        if key not in self._stage_cache:
            import dataclasses as _dc

            opts, ycfg = self.options, self.yolo_config
            enc_size = opts.encoder_size_for(h, w)
            gs = enc_size // self.sam_config.patch_size
            # window 16 divides every grid in the auto ladder -> zero window
            # padding (window 14 pads 32->42 / 64->70: up to 72% extra work)
            ws = 16 if gs % 16 == 0 else self.sam_config.window_size
            scfg = _dc.replace(self.sam_config, image_size=enc_size, window_size=ws)
            # cast once OUTSIDE jit: per-call f32->bf16 converts of ~90M
            # params showed up as real per-iteration work in the profile
            sam_params = _cast_floating(self._sam_params_for(scfg), opts.compute_dtype)
            if opts.quant == "int8":
                from ..ops.quant import quantize_sam_encoder_params

                sam_params = quantize_sam_encoder_params(sam_params)
            if opts.tinyvit_stem_s2d and "tinyvit" in sam_params:
                from ..models.sam.tinyvit import transform_stem_s2d

                sam_params = dict(sam_params)
                sam_params["tinyvit"] = dict(sam_params["tinyvit"])
                # transform from the ORIGINAL fp32 weights, then cast
                sam_params["tinyvit"]["stem_s2d"] = _cast_floating(
                    transform_stem_s2d(self.sam_params["tinyvit"]),
                    opts.compute_dtype,
                )
            yolo_params_c = _cast_floating(self.yolo_params, opts.compute_dtype)
            # s2d backbone prefix: exact-equivalent conv rewrite that keeps
            # the MXU lanes full on the narrow early YOLO stages (TPU only —
            # on CPU the native layout is faster and parity tests use it)
            yolo_s2d = None
            if jax.default_backend() != "cpu":
                from ..models.yolo.s2d import transform_backbone_params

                yolo_s2d = _cast_floating(
                    transform_backbone_params(self.yolo_params),
                    opts.compute_dtype,
                )
            if self.mesh is None:
                # init trees are host-numpy: move everything to device in one
                # packed transfer per dtype (per-leaf puts cost ~100 ms of
                # round-trip each on the tunneled backend)
                sam_params, yolo_params_c, yolo_s2d = (
                    jax.device_put((sam_params, yolo_params_c, yolo_s2d))
                    if jax.default_backend() == "cpu"
                    else _device_put_packed((sam_params, yolo_params_c, yolo_s2d))
                )
            if self.mesh is not None:
                # replicate weights across the mesh once; sharded image
                # inputs then make every jitted stage an SPMD program
                from ..parallel.mesh import replicate_sharding

                rep = replicate_sharding(self.mesh)
                put = lambda x: jax.device_put(x, rep)
                sam_params = jax.tree_util.tree_map(put, sam_params)
                yolo_params_c = jax.tree_util.tree_map(put, yolo_params_c)
                if yolo_s2d is not None:
                    yolo_s2d = jax.tree_util.tree_map(put, yolo_s2d)

            # yolo_s2d rides as an ARGUMENT, never a closure capture:
            # closed-over weight arrays bake into the HLO as constants, so
            # every new random init produced a different cache key — a
            # fresh ~190 s remote compile of the same program (queue r4a
            # leg 2). As an argument the HLO is value-independent and the
            # persistent cache hits across processes and seeds.
            detect_core = jax.jit(
                lambda yp, s2d, img: detect_stage(yp, img, ycfg, opts, s2d)
            )
            detect = lambda yp, img: detect_core(yp, yolo_s2d, img)
            embed = jax.jit(lambda sp, img: embed_stage(sp, img, scfg, opts))
            segment = jax.jit(
                lambda sp, emb, boxes, val: segment_stage(
                    sp, emb, boxes, val, (h, w), scfg, opts
                )
            )
            metrics = jax.jit(
                lambda crops, offs, gray: metrics_stage(crops, offs, gray, (h, w), opts)
            )

            def fused_core_fn(yp, sp, s2d, img):
                boxes, scores, valid = detect_stage(yp, img, ycfg, opts, s2d)
                emb = embed_stage(sp, img, scfg, opts)
                crops, offs = segment_stage(sp, emb, boxes, valid, (h, w), scfg, opts)
                gray = _gray_f32(img)
                mets = metrics_stage(crops, offs, gray, (h, w), opts)
                return boxes, scores, valid, crops, offs, mets

            fused_core = jax.jit(fused_core_fn)
            fused_jit = lambda yp, sp, img: fused_core(yp, sp, yolo_s2d, img)
            fused_many_core = jax.jit(
                lambda yp, sp, s2d, imgs: jax.lax.map(
                    lambda im: fused_core_fn(yp, sp, s2d, im), imgs
                )
            )
            fused_many = lambda yp, sp, imgs: fused_many_core(
                yp, sp, yolo_s2d, imgs
            )
            if opts.encoder_parallel != "none":
                # tp/sp-sharded SAM encoder (PipelineOptions.encoder_parallel):
                # the encoder stage routes through the parallel/ runners
                # (their shard_map programs carry their own jit + sharding);
                # the surrounding stages stay dp-sharded jits and "fused"
                # becomes their composition — at ViT-L/H scale the encoder is
                # ~95% of the program, so cross-stage fusion is immaterial.
                embed, ep_state, ep_embed_fn = self._parallel_embed(
                    scfg, opts, sam_params
                )

                def fused_staged(yp, sp, img):
                    boxes, scores, valid = detect(yp, img)
                    emb = embed(sp, img)
                    crops, offs = segment(sp, emb, boxes, valid)
                    mets = metrics(crops, offs, _gray_jit(img))
                    return boxes, scores, valid, crops, offs, mets

                fused_jit = fused_staged

                # chunked saturated-stream path: ONE dispatch for N batches
                # (lax.map), same as the non-parallel fused_many — the
                # shard_map encoder runner traces fine inside the mapped
                # body, and the sharded params ride as ARGUMENTS (closure
                # arrays would bake value-dependent constants into the HLO).
                # Replaces the r4 per-image python loop that silently paid
                # N dispatches (VERDICT r4 weak #4c).
                def staged_core_fn(yp, sp, esp, s2d, img):
                    boxes, scores, valid = detect_stage(yp, img, ycfg, opts, s2d)
                    emb = ep_embed_fn(esp, img)
                    crops, offs = segment_stage(
                        sp, emb, boxes, valid, (h, w), scfg, opts
                    )
                    mets = metrics_stage(crops, offs, _gray_f32(img), (h, w), opts)
                    return boxes, scores, valid, crops, offs, mets

                fused_many_core_ep = jax.jit(
                    lambda yp, sp, esp, s2d, imgs: jax.lax.map(
                        lambda im: staged_core_fn(yp, sp, esp, s2d, im), imgs
                    )
                )
                fused_many = lambda yp, sp, imgs: fused_many_core_ep(
                    yp, sp, ep_state["sharded"], yolo_s2d, imgs
                )

            self._stage_cache[key] = {
                "detect": detect,
                "embed": embed,
                "segment": segment,
                "metrics": metrics,
                "fused": fused_jit,
                # N batches per dispatch (lax.map over the leading axis):
                # per-dispatch host/tunnel overhead measured ~3.3 ms against
                # ~254 ms of device work per batch — chunking recovers that
                # last ~1.3% for saturated streams
                "fused_many": fused_many,
                # device-side bitpack: mask crops cross the link at 1 bit/px
                # instead of 1 byte/px (the d2h transfer is the stage path's
                # second-largest cost on the tunneled backend)
                "pack": jax.jit(lambda crops: jnp.packbits(crops, axis=-1)),
                # every CSV-needed per-detection output in one fp32 tensor:
                # the host fetch is ONE transfer instead of ~21 (boxes,
                # scores, valid, offsets + 16 metric arrays), each of which
                # paid a fixed round-trip latency on the tunneled link
                # (measured ~0.9 s/batch of fetch at B=128, CSV-only)
                "pack_csv": jax.jit(_pack_csv_outputs),
                "sam_params": sam_params,
                "yolo_params": yolo_params_c,
                # constant-free jittable core + the bound s2d tree, for
                # callers (e.g. __graft_entry__) that need the pure fn
                "fused_core": fused_core,
                "yolo_s2d": yolo_s2d,
            }
        return self._stage_cache[key]

    def _parallel_embed(self, scfg: SamTPUConfig, opts: PipelineOptions,
                        sam_params):
        """Embed-stage callable for ``PipelineOptions.encoder_parallel``:
        preprocess (jitted, dp-sharded) -> tp/sp shard_map encoder runner
        (parallel/tp.py / parallel/sp.py — parity-tested against the
        single-device encoder on the virtual mesh)."""
        enc_par = opts.encoder_parallel
        if enc_par not in ("tp", "sp"):
            raise ValueError(
                f"encoder_parallel must be 'none', 'tp' or 'sp', got {enc_par!r}"
            )
        if self.mesh is None or enc_par not in self.mesh.axis_names:
            raise ValueError(
                f"encoder_parallel={enc_par!r} requires a mesh with a "
                f"{enc_par!r} axis (e.g. parallel.mesh.make_mesh(dp=1, tp=N) "
                "or make_mesh_axes(dp=1, sp=N))"
            )
        if "vision" not in sam_params:
            raise ValueError(
                "encoder_parallel supports ViT SAM encoders only (TinyViT's "
                "conv stages have no tp/sp sharding)"
            )
        if opts.quant == "int8":
            raise ValueError(
                "encoder_parallel does not compose with quant='int8' yet "
                "(the tp/sp sharders read float {'w','b'} records, not the "
                "quantized {'wq','wscale','b'} layout) — pick one"
            )
        mesh = self.mesh

        def pre_fn(img):
            return sam_preprocess_batch(_ensure_rgb(img), scfg.image_size)[
                0
            ].astype(opts.compute_dtype)

        if enc_par == "tp":
            from ..parallel.tp import sam_image_encoder_tp, shard_sam_encoder_tp

            tp_params, tp_specs = shard_sam_encoder_tp(sam_params, scfg, mesh)
            state = {"src": sam_params, "sharded": tp_params}

            def reshard(params):
                return shard_sam_encoder_tp(params, scfg, mesh)[0]

            def ep_embed_fn(sharded, img):
                """Pure traceable embed: preprocess + tp shard_map runner
                (sharded params ride as an argument — used by the chunked
                fused_many's lax.map body)."""
                return sam_image_encoder_tp(
                    sharded, tp_specs, pre_fn(img), scfg, mesh
                ).astype(jnp.float32)

        else:
            from ..parallel.sp import sam_image_encoder_sp, shard_sam_encoder_sp

            sp_params = shard_sam_encoder_sp(sam_params, scfg, mesh)
            state = {"src": sam_params, "sharded": sp_params}

            def reshard(params):
                return shard_sam_encoder_sp(params, scfg, mesh)

            def ep_embed_fn(sharded, img):
                return sam_image_encoder_sp(
                    sharded, pre_fn(img), scfg, mesh
                ).astype(jnp.float32)

        embed_core = jax.jit(ep_embed_fn)

        def embed(sam_params2, img):
            # The stage contract is st["embed"](sam_params, img). The
            # encoder actually runs on the tp/sp-sharded copy built at
            # stage-build time; if a caller passes a DIFFERENT params tree,
            # reshard it now instead of silently running stale weights
            # (ADVICE r4). Identity check is free for the engine's own
            # calls, which always pass the build-time tree.
            if sam_params2 is not state["src"]:
                state["src"] = sam_params2
                state["sharded"] = reshard(sam_params2)
            return embed_core(state["sharded"], img)

        return embed, state, ep_embed_fn

    # -- array-level API -------------------------------------------------------

    def _images_to_device(self, images: np.ndarray) -> Tuple[jnp.ndarray, int]:
        """Place a uint8 image batch on device. With a mesh, pad the batch to
        a dp multiple and shard it over 'dp' (weights are replicated in
        :meth:`_stages`); returns (device array, original batch size).

        Grayscale-as-RGB batches (all three channels identical — the usual
        microscopy case) are transferred as a single channel: host->device
        bytes are the pipeline's measured bottleneck, and the device
        re-broadcasts to RGB for free (see :func:`_ensure_rgb`).
        """
        b = int(images.shape[0])
        if images.ndim == 4 and images.shape[-1] == 3:
            c0 = images[..., 0]
            if np.array_equal(c0, images[..., 1]) and np.array_equal(
                c0, images[..., 2]
            ):
                images = np.ascontiguousarray(c0)
        if self.mesh is None:
            return jnp.asarray(images), b
        from ..parallel.mesh import data_sharding

        pad = (-b) % self._dp
        if pad:
            images = np.concatenate(
                [images, np.zeros((pad, *images.shape[1:]), images.dtype)], axis=0
            )
        return jax.device_put(images, data_sharding(self.mesh, images.ndim)), b

    def process_batch_arrays(
        self,
        images: np.ndarray,
        timings: Optional[Dict[str, float]] = None,
        fetch_masks: bool = True,
        fetch_outputs: bool = True,
    ) -> Optional[Dict[str, np.ndarray]]:
        """Run the stage-jitted pipeline on a uint8 batch — (B, H, W, 3)
        RGB or (B, H, W) grayscale (the loader collapses replicated-RGB
        sources; the device re-broadcasts for free).

        Returns host arrays: boxes (B, K, 4), scores, valid, mask_crops
        (B, K, cm, cm), offsets (B, K, 2), metrics {key: (B, K)}. When
        ``timings`` is given, accumulates real per-stage device seconds into
        the reference timing keys. ``fetch_masks=False`` skips the mask
        bitpack + device->host crop transfer (~4 MB/batch at the default
        shape — the dominant fetch cost on the tunneled link) and returns
        ``mask_crops=None``; metrics/boxes are unaffected (CSV-only runs).
        ``fetch_outputs=False`` returns ``None`` after the (synced, timed)
        stage dispatches — the timing-sample mode of
        :meth:`process_directory`, which only needs the per-stage seconds.
        """
        h, w = images.shape[1], images.shape[2]
        st = self._stages(h, w)

        def timed(key, fn, *a):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            if timings is not None:
                timings[key] = timings.get(key, 0.0) + time.perf_counter() - t0
            return out

        dev_images, b = self._images_to_device(images)
        boxes, scores, valid = timed("yolo_detection", st["detect"], st["yolo_params"], dev_images)
        emb = timed("sam_preprocess", st["embed"], st["sam_params"], dev_images)
        crops, offs = timed(
            "sam_inference_total", st["segment"], st["sam_params"], emb, boxes, valid
        )
        gray = _gray_f32(dev_images)
        mets = timed("metrics_total", st["metrics"], crops, offs, gray)
        if not fetch_outputs:
            return None
        # 1 bit/px across the link, unpack on host
        packed = st["pack"](crops) if fetch_masks else None
        return self._fetch_outputs(
            {"boxes": boxes, "scores": scores, "valid": valid, "packed": packed,
             "offsets": offs, "metrics": mets, "b": b, "cm": crops.shape[-1],
             "csv": st["pack_csv"](boxes, scores, valid, offs, mets)}
        )

    def _dispatch_batch(
        self, images: np.ndarray, fetch_masks: bool = True
    ) -> Dict[str, Any]:
        """Dispatch the FUSED program + device-side mask bitpack for one
        batch WITHOUT host sync; returns device handles for
        :meth:`_fetch_outputs`. The async building block of
        :meth:`process_directory`: batch i computes on device while batch
        i-1's results stream back and batch i+1 decodes on the host.

        ``fetch_masks=False`` drops the bitpack dispatch so the crop tensor
        never crosses the link (CSV-only directory runs)."""
        st = self._stages(images.shape[1], images.shape[2])
        dev_images, b = self._images_to_device(images)
        boxes, scores, valid, crops, offs, mets = st["fused"](
            st["yolo_params"], st["sam_params"], dev_images
        )
        packed = st["pack"](crops) if fetch_masks else None
        return {"boxes": boxes, "scores": scores, "valid": valid,
                "packed": packed, "offsets": offs, "metrics": mets,
                "b": b, "cm": crops.shape[-1],
                "csv": st["pack_csv"](boxes, scores, valid, offs, mets)}

    @staticmethod
    def _fetch_outputs(h: Dict[str, Any]) -> Dict[str, np.ndarray]:
        """Materialize device handles to host arrays. [:b] drops dp-padding
        rows added by _images_to_device (no-op when the mesh is absent or
        the batch already divides dp).

        When the handle carries a ``csv`` pack (see :func:`_pack_csv_outputs`)
        the per-detection outputs come back in ONE device->host transfer and
        are split on host; the per-array path below is the fallback for
        hand-built handles. Every packed field is exactly representable in
        fp32 (coordinates < 2^24, bool, fp32 metrics), so the round-trip is
        lossless."""
        b, cm = h["b"], h["cm"]
        mask_crops = None
        if h["packed"] is not None:
            # unpackbits yields exact 0/1 bytes, so the bool reinterpret is a
            # free view — .astype(bool) re-copied the whole 33 MB crop tensor
            mask_crops = np.unpackbits(np.asarray(h["packed"])[:b], axis=-1)[
                ..., :cm
            ].view(np.bool_)
        if h.get("csv") is not None:
            flat = np.asarray(h["csv"])[:b]  # (b, K, 8 + M) fp32
            keys = sorted(h["metrics"])
            return {
                "boxes": flat[..., :4],
                "scores": flat[..., 4],
                "valid": flat[..., 5] > 0.5,
                "mask_crops": mask_crops,
                "offsets": flat[..., 6:8].astype(np.int32),
                "metrics": {k: flat[..., 8 + i] for i, k in enumerate(keys)},
            }
        return {
            "boxes": np.asarray(h["boxes"])[:b],
            "scores": np.asarray(h["scores"])[:b],
            "valid": np.asarray(h["valid"])[:b],
            "mask_crops": mask_crops,
            "offsets": np.asarray(h["offsets"])[:b],
            "metrics": {k: np.asarray(v)[:b] for k, v in h["metrics"].items()},
        }

    def detect_batch_arrays(self, images: np.ndarray) -> Dict[str, np.ndarray]:
        """YOLO-only path: uint8 (B, H, W[, 3]) -> boxes/scores/valid on host
        (for detection-only tools like the frame cleaner)."""
        h, w = images.shape[1], images.shape[2]
        st = self._stages(h, w)
        dev_images, b = self._images_to_device(images)
        boxes, scores, valid = st["detect"](st["yolo_params"], dev_images)
        return {
            "boxes": np.asarray(boxes)[:b],
            "scores": np.asarray(scores)[:b],
            "valid": np.asarray(valid)[:b],
        }

    def fused_call(self, images: jnp.ndarray):
        """Single-program execution (maximum throughput; used by bench).

        With a mesh, the batch is dp-sharded (and padded to a dp multiple:
        outputs then carry the padded batch dimension — callers that need
        exactly the input batch should slice ``[:len(images)]``).
        """
        h, w = images.shape[1], images.shape[2]
        st = self._stages(h, w)
        if self.mesh is not None:
            images, _ = self._images_to_device(np.asarray(images))
        return st["fused"](st["yolo_params"], st["sam_params"], images)

    def fused_call_chunked(self, images: jnp.ndarray):
        """Run N fused batches in ONE dispatch: ``images`` is (N, B, H, W, C)
        and the fused program is ``lax.map``-ed over the leading axis.

        Use for saturated throughput streams: each ``fused_call`` dispatch
        costs ~3 ms of host/tunnel overhead regardless of batch size, so a
        back-to-back batch stream leaves a ~1.3% device bubble that this
        removes (single-chip serving; with a mesh use ``fused_call`` per
        dp-sharded batch instead).
        """
        h, w = images.shape[2], images.shape[3]
        st = self._stages(h, w)
        return st["fused_many"](st["yolo_params"], st["sam_params"], images)

    # -- host-level helpers -----------------------------------------------------

    @staticmethod
    def _metrics_row(metrics: Dict[str, np.ndarray], b: int, k: int) -> Dict[str, Any]:
        row = {}
        for key in METRIC_KEYS:
            v = float(metrics[key][b, k])
            row[key] = int(round(v)) if key in INT_METRIC_KEYS else v
        return row

    def _results_from_outputs(
        self,
        out: Dict[str, np.ndarray],
        image_paths: Sequence[Union[str, Path]],
        n_valid_images: int,
    ) -> List[ProcessingResult]:
        # one vectorized pass per metric key instead of a numpy scalar
        # extraction per (cell, key) — the row-assembly half of the e2e
        # path's host budget (B*K*17 float() calls per batch)
        valid = np.asarray(out["valid"][:n_valid_images], dtype=bool)
        cols = {}
        for key in METRIC_KEYS:
            arr = out["metrics"][key][:n_valid_images]
            if key in INT_METRIC_KEYS:
                cols[key] = np.round(arr).astype(np.int64)
            else:
                cols[key] = np.asarray(arr, dtype=np.float64)
        results = []
        for i in range(n_valid_images):
            kidx = np.flatnonzero(valid[i])
            per_key = {key: cols[key][i, kidx].tolist() for key in METRIC_KEYS}
            cell_metrics = [
                {key: per_key[key][j] for key in METRIC_KEYS}
                for j in range(len(kidx))
            ]
            results.append(
                ProcessingResult(
                    image_path=str(image_paths[i]),
                    cell_metrics=cell_metrics,
                    num_cells=len(cell_metrics),
                    timing={},
                )
            )
        return results

    def _load_image(self, image_path: Union[str, Path]) -> np.ndarray:
        """Load an image as RGB uint8 (reference ``pipeline.py:206-210``)."""
        return load_image(image_path)

    # -- public single-image / directory API -------------------------------------

    def process_single_image(
        self,
        image_path: Union[str, Path],
        output_path: Union[str, Path],
        save_visualizations: bool = True,
    ) -> ProcessingResult:
        """Process one image (API parity: reference ``pipeline.py:126-204``)."""
        timings: Dict[str, float] = {}
        t0 = time.time()
        image = self._load_image(image_path)
        timings["image_load"] = time.time() - t0

        out = self.process_batch_arrays(image[None], timings)
        result = self._results_from_outputs(out, [image_path], 1)[0]

        t0 = time.time()
        if save_visualizations:
            from .visualize import save_visualizations as save_vis

            try:
                save_vis(
                    image,
                    out["mask_crops"][0],
                    out["offsets"][0],
                    out["boxes"][0],
                    out["valid"][0],
                    result.cell_metrics,
                    Path(output_path),
                    Path(image_path).stem,
                )
            except Exception as e:  # visualization failures are non-fatal
                logger.warning("Visualization failed for %s: %s", image_path, e)
        timings["visualization"] = time.time() - t0
        timings["sam_postprocess_total"] = timings.get("sam_postprocess_total", 0.0)
        timings["total_time"] = time.time() - t0 + sum(
            v for k, v in timings.items() if k not in ("total_time", "visualization")
        )
        timings["cells_processed"] = result.num_cells
        result.timing = timings
        logger.info(
            "Processed %s: %d cells detected", Path(image_path).name, result.num_cells
        )
        return result

    def process_directory(
        self,
        input_dir: Union[str, Path],
        output_dir: Union[str, Path],
        save_visualizations: bool = False,
        image_paths: Optional[Sequence[Path]] = None,
        progress: bool = True,
    ) -> BatchProcessingResult:
        """Process a folder of images in device batches
        (API parity: reference ``pipeline.py:212-263``)."""
        input_dir = Path(input_dir)
        if image_paths is None and not input_dir.is_dir():
            raise FileNotFoundError(f"input directory does not exist: {input_dir}")
        output_dir = Path(output_dir) / self.run_id
        output_dir.mkdir(parents=True, exist_ok=True)

        files = list(image_paths) if image_paths is not None else list_image_files(input_dir)
        results: List[ProcessingResult] = []
        total_timing = initialize_timing_dict()
        metrics_data: List[Dict[str, Any]] = []
        timing_data: List[Dict[str, Any]] = []

        from .loader import batched_image_loader

        # per-run config snapshot (SURVEY §5.6: the reference snapshotted
        # params to pipeline_parameters.json per run)
        import dataclasses as _dc
        import json as _json

        with open(output_dir / "pipeline_parameters.json", "w") as f:
            snap = {
                k: (str(v) if not isinstance(v, (int, float, bool, type(None))) else v)
                for k, v in _dc.asdict(self.options).items()
            }
            snap.update({"sam_model_type": self.sam_model_type, "run_id": self.run_id})
            _json.dump(snap, f, indent=2)

        from .loader import prefetch_iterator

        bsz = self.options.batch_size
        import os as _os

        # measured-best on the 1-vCPU tunneled host (BENCH_NOTES r3 s5);
        # env knobs for pipelining A/Bs on other hosts
        depth = int(_os.environ.get("E2E_PREFETCH_DEPTH", "3"))
        inflight = int(_os.environ.get("E2E_INFLIGHT", "2"))
        batches = prefetch_iterator(
            batched_image_loader(
                files, bsz, skipped_report=output_dir / "skipped_images.txt"
            ),
            depth=depth,
        )
        # Async pipelined execution (single-core host, tunneled device): the
        # fused program for batch i is dispatched without sync, then batch
        # i-1's results are fetched/assembled while i computes — overlapping
        # device work with host decode + CSV assembly. Per-stage timing rows
        # come from a synced, stage-jitted SAMPLE sub-batch (at the first
        # batch, then every 16th); all batches reuse the latest sample's
        # per-image values (per-image amortization was already the
        # reporting contract). Short runs (< 2 batches) keep the pure stage
        # path — the fused program would cost an extra XLA compile for no
        # overlap benefit.
        few = len(files) <= bsz
        pending: List[Tuple[Any, Any, List[Path], int, Dict[str, float]]] = []
        sampled: Dict[str, float] = {}
        # host-side wall-time attribution for the whole directory run
        # (exposed as ``self.last_directory_stats`` — bench.py's BENCH_E2E
        # reports it so tunnel-transfer vs decode vs assembly costs are
        # visible per run; the per-image ``timing`` rows keep the reference
        # schema untouched)
        stats = {"decode_s": 0.0, "dispatch_s": 0.0, "fetch_s": 0.0,
                 "assemble_s": 0.0, "sample_sync_s": 0.0, "vis_s": 0.0,
                 "n_images": 0, "n_batches": 0, "n_sample_batches": 0}
        wall_t0 = time.perf_counter()

        # timing-sample sub-batch size: per-stage timing rows come from a
        # synced stage-jitted run of this many images (not the full batch —
        # the full-batch synced sample serialized ~1.5-2 s per 768-image
        # run against the async fused steady state)
        sample_n = max(1, int(_os.environ.get("E2E_SAMPLE_BATCH", "32")))

        def run_batch(timed, batch_imgs, batch_paths, n_valid, load_s):
            timings: Dict[str, float] = {"image_load": load_s}
            stats["decode_s"] += load_s
            stats["n_batches"] += 1
            if timed and few:
                # single-batch runs: the stage path IS the whole run — one
                # synced pass yields both the results and the timing rows
                # (a fused program would cost an extra compile for nothing)
                t0 = time.perf_counter()
                out = self.process_batch_arrays(
                    batch_imgs, timings, fetch_masks=save_visualizations
                )
                stats["sample_sync_s"] += time.perf_counter() - t0
                stats["n_sample_batches"] += 1
                return (out, None, batch_paths, n_valid, timings)
            if timed:
                # sample per-stage device seconds on a small synced
                # sub-batch (the per-image amortized timing contract,
                # reference pipeline.py:271-284); the full batch then flows
                # through the async fused path like every other batch
                sb = min(sample_n, len(batch_imgs))
                stage_t: Dict[str, float] = {}
                t0 = time.perf_counter()
                self.process_batch_arrays(
                    batch_imgs[:sb], stage_t,
                    fetch_masks=False, fetch_outputs=False,
                )
                stats["sample_sync_s"] += time.perf_counter() - t0
                stats["n_sample_batches"] += 1
                sampled.clear()
                sampled.update({k: v / sb for k, v in stage_t.items()})
            # stage keys scaled to this batch's size: rows divide by
            # n_valid again in finish(), so each row carries the sampled
            # per-image device seconds
            timings.update(
                {k: v * max(n_valid, 1) for k, v in sampled.items()}
            )
            t0 = time.perf_counter()
            handles = self._dispatch_batch(
                batch_imgs, fetch_masks=save_visualizations
            )
            stats["dispatch_s"] += time.perf_counter() - t0
            return (None, handles, batch_paths, n_valid, timings)

        def finish(entry, batch_imgs):
            out, handles, batch_paths, n_valid, timings = entry
            if out is None:
                t0 = time.perf_counter()
                out = self._fetch_outputs(handles)
                stats["fetch_s"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            batch_results = self._results_from_outputs(out, batch_paths, n_valid)
            stats["assemble_s"] += time.perf_counter() - t0
            stats["n_images"] += n_valid

            vis_t0 = time.time()
            if save_visualizations:
                from .visualize import save_visualizations as save_vis

                for i, res in enumerate(batch_results):
                    try:
                        img = batch_imgs[i]
                        if img.ndim == 2:  # loader-collapsed grayscale
                            img = np.repeat(img[..., None], 3, axis=-1)
                        save_vis(
                            img,
                            out["mask_crops"][i],
                            out["offsets"][i],
                            out["boxes"][i],
                            out["valid"][i],
                            res.cell_metrics,
                            output_dir,
                            Path(res.image_path).stem,
                        )
                    except Exception as e:
                        logger.warning("Visualization failed: %s", e)
            vis_s = time.time() - vis_t0
            stats["vis_s"] += vis_s
            row_t0 = time.perf_counter()

            per_img = 1.0 / max(n_valid, 1)
            for res in batch_results:
                res.timing = {
                    "image_load": timings.get("image_load", 0.0) * per_img,
                    "yolo_detection": timings.get("yolo_detection", 0.0) * per_img,
                    "sam_preprocess": timings.get("sam_preprocess", 0.0) * per_img,
                    "sam_inference_total": timings.get("sam_inference_total", 0.0) * per_img,
                    "sam_postprocess_total": 0.0,
                    "metrics_total": timings.get("metrics_total", 0.0) * per_img,
                    "visualization": vis_s * per_img,
                    "total_time": (sum(timings.values()) + vis_s) * per_img,
                    "cells_processed": res.num_cells,
                }
                update_total_timing(total_timing, res.timing)
                collect_metrics_data(metrics_data, res)
                collect_timing_data(timing_data, res)
                results.append(res)
            stats["assemble_s"] += time.perf_counter() - row_t0
            if progress:
                logger.info(
                    "processed %d/%d images (%d cells so far)",
                    len(results),
                    len(files),
                    int(total_timing["total_cells"]),
                )

        for bi, (batch_imgs, batch_paths, n_valid, load_s) in enumerate(batches):
            timed = few or bi % 16 == 0
            if timed:
                # drain in-flight async batches first: their un-fetched
                # device work would otherwise be absorbed into the sample
                # batch's first timed stage and skew 15 batches of rows
                while pending:
                    finish(*pending.pop(0))
            pending.append(
                (run_batch(timed, batch_imgs, batch_paths, n_valid, load_s),
                 batch_imgs)
            )
            # two async batches in flight (default): the fetch RPC wait for
            # batch i-2 overlaps batch i-1's device compute AND batch i's
            # host decode (measured 3.9 s of idle RPC wait per 768-image run
            # with a single in-flight batch on the tunneled link)
            if len(pending) > inflight:
                finish(*pending.pop(0))
        while pending:
            finish(*pending.pop(0))

        stats["wall_s"] = time.perf_counter() - wall_t0
        # decode_s is thread-overlapped loader time; sample_sync_s serializes
        # (device-synced stage rows); the rest is the async steady state.
        self.last_directory_stats = {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in stats.items()
        }

        return BatchProcessingResult(
            results=results,
            total_timing=total_timing,
            metrics_data=metrics_data,
            timing_data=timing_data,
        )


class ParallelCellSegmentationPipeline(CellSegmentationPipeline):
    """API-parity wrapper for the reference's thread-replica pipeline
    (reference ``pipeline.py:440-643``).

    On TPU there is no reason to replicate model weights across host threads
    (the GIL-bound design the reference used): batching + ``jax.sharding``
    data parallelism across devices replaces it. ``num_pipelines`` is
    accepted and mapped to the device batch size multiplier: where the
    reference ran N thread replicas each on its own image, this runs one
    device program over an N x batch_size image batch.
    """

    def __init__(self, *args, num_pipelines: int = 2, **kwargs) -> None:
        import dataclasses as _dc

        opts = kwargs.get("options") or PipelineOptions()
        kwargs["options"] = _dc.replace(
            opts, batch_size=opts.batch_size * max(1, int(num_pipelines))
        )
        super().__init__(*args, **kwargs)
        self.num_pipelines = num_pipelines

    def process_image(
        self, image: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Direct ndarray API (reference ``pipeline.py:469-503``):
        returns (boxes xyxy, full-size masks, scores) for one RGB image."""
        image = np.asarray(image)
        if image.ndim == 2:
            image = np.repeat(image[..., None], 3, axis=2)
        out = self.process_batch_arrays(image[None].astype(np.uint8))
        valid = out["valid"][0]
        n = int(valid.sum())
        h, w = image.shape[:2]
        masks = np.zeros((n, h, w), dtype=bool)
        j = 0
        cm = out["mask_crops"].shape[-1]
        for k in range(valid.shape[0]):
            if not valid[k]:
                continue
            r0, c0 = out["offsets"][0, k]
            masks[j, r0 : r0 + cm, c0 : c0 + cm] = out["mask_crops"][0, k]
            j += 1
        return out["boxes"][0][valid], masks, out["scores"][0][valid]
