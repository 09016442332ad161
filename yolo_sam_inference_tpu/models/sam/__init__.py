"""SAM (Segment Anything) in pure functional JAX, TPU-first.

Replaces the reference's black-box HuggingFace ``SamModel`` usage
(reference ``pipeline.py:76-77, 105-110``). Architecture follows the public
SAM design (ViT image encoder with windowed + global relative-position
attention, random-Fourier prompt encoder, two-way transformer mask decoder);
weights convert from HuggingFace ``facebook/sam-vit-{base,large,huge}``
checkpoints via :mod:`convert`.

The TPU-critical structural change: the image encoder runs **once per image
batch** and the prompt encoder + mask decoder are batched over all box
prompts in a single fixed-shape program — the reference re-ran the entire
ViT encoder for every detected box.
"""

from .config import SamTPUConfig, sam_vit_b, sam_vit_l, sam_vit_h, sam_tiny_test
from .model import (
    init_sam_params,
    sam_image_encoder,
    sam_prompt_boxes,
    sam_mask_decoder,
    sam_forward_boxes,
)
from .convert import convert_hf_sam_state_dict

__all__ = [
    "SamTPUConfig",
    "sam_vit_b",
    "sam_vit_l",
    "sam_vit_h",
    "sam_tiny_test",
    "init_sam_params",
    "sam_image_encoder",
    "sam_prompt_boxes",
    "sam_mask_decoder",
    "sam_forward_boxes",
    "convert_hf_sam_state_dict",
]
