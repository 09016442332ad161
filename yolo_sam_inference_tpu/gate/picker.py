"""Legacy interactive ROI picker (reference
``examples/example_project_inference.py:226-262``).

The reference's workflow opened a cv2 window per condition: the operator
clicks two X positions (vertical green lines preview the gate), presses
``r`` to reset or ``c`` to confirm, and the pair becomes that condition's
``{x_min, x_max}``. This module reproduces that interaction verbatim for
workstation use; on a headless host it raises a clear error pointing at
the non-interactive equivalents (the ``--roi``/``--roi-file`` runner
flags and the ``web/app.py`` browser picker, which this framework added
precisely because production TPU hosts have no display).
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple


def get_roi_coordinates(image_path: Path) -> Tuple[int, int]:
    """Open a cv2 window and return the clicked ``(x_min, x_max)`` pair.

    Interaction parity with the reference: left-click adds a vertical
    line (max two), ``r`` resets, ``c`` confirms once two points exist.
    """
    try:
        import cv2
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "interactive ROI picking needs cv2; use --roi/--roi-file or "
            "the web picker (yolo_sam_inference_tpu.web.app) instead"
        ) from e

    image = cv2.imread(str(image_path))
    if image is None:
        raise ValueError(f"Could not read image: {image_path}")

    window_name = (
        "Select ROI - Click two points for min and max X coordinates "
        "(Press 'r' to reset, 'c' to confirm)"
    )
    try:
        cv2.namedWindow(window_name)
    except cv2.error as e:  # pragma: no cover - headless host
        raise RuntimeError(
            "no display available for the interactive ROI picker; use "
            "--roi/--roi-file or the web picker (web/app.py) instead"
        ) from e
    points: list[int] = []

    def mouse_callback(event, x, y, flags, param):
        if event == cv2.EVENT_LBUTTONDOWN and len(points) < 2:
            points.append(x)
            img_copy = image.copy()
            for px in points:
                cv2.line(img_copy, (px, 0), (px, image.shape[0]), (0, 255, 0), 2)
            cv2.imshow(window_name, img_copy)

    cv2.setMouseCallback(window_name, mouse_callback)
    while True:
        if not points:
            cv2.imshow(window_name, image)
        key = cv2.waitKey(1) & 0xFF
        if key == ord("r"):
            points.clear()
            cv2.imshow(window_name, image)
        elif key == ord("c") and len(points) == 2:
            break
    cv2.destroyAllWindows()
    return min(points), max(points)
