"""YOLOv8 detector in pure functional JAX, TPU-first.

Replaces the reference's black-box ``ultralytics.YOLO`` usage (reference
``pipeline.py:72, 84-87``). The conv backbone + PAN head + DFL detect head
run as one fixed-shape NHWC program; BatchNorm is folded into conv weights at
load time (inference), and NMS runs on device with static max-detections
(``ops/nms.py``). Weights convert from ultralytics ``.pt`` state dicts.
"""

from .config import YoloConfig, yolov8n, yolov8s, yolov8m
from .model import init_yolo_params, yolo_forward, decode_predictions
from .convert import convert_ultralytics_state_dict, load_yolo_params

__all__ = [
    "YoloConfig",
    "yolov8n",
    "yolov8s",
    "yolov8m",
    "init_yolo_params",
    "yolo_forward",
    "decode_predictions",
    "convert_ultralytics_state_dict",
    "load_yolo_params",
]
