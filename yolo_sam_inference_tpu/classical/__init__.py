"""Classical (model-free) cell detection pipeline.

TPU re-design of the reference's OpenCV background-subtraction pipeline
(reference ``examples/opencv_project_inference.py:122-385``): the pixel-heavy
stages (absdiff, blur, threshold, morphology) run batched on device
(``ops/morphology.py``); connected-component extraction — inherently
sequential — stays on host via ``scipy.ndimage.label``.
"""

from .pipeline import ClassicalPipeline, ClassicalParams

__all__ = ["ClassicalPipeline", "ClassicalParams"]
