"""I/O layer: image readers/writers and binary stream formats.

Replaces the reference's third-party I/O stack (tifffile, cv2.imread) with
self-contained implementations: a tiled-TIFF codec (``tiff.py``), generic
image loading (``images.py``), and the ``images.bin`` acquisition-stream
parser (``images_bin.py``, format spec quoted at reference
``tools/ms_opencv_process.py:1-29``).
"""

from .tiff import write_tiff, read_tiff
from .images import load_image, save_image, list_image_files

__all__ = ["write_tiff", "read_tiff", "load_image", "save_image", "list_image_files"]
