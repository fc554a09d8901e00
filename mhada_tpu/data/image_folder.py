"""ImageFolder-equivalent dataset + the reference's train-time transform.

The reference uses torchvision ImageFolder with Resize(512,512) ->
RandomCrop(256,256) -> ToTensor*255 (reference utilities.py:28-40,
datasets.py:17-30).  Same recipe here with numpy/PIL, returning float32 HWC
0-255 arrays.
"""

import os
import random
from typing import Optional, Tuple

import numpy as np
from PIL import Image

_IMG_EXT = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".ppm", ".tif", ".tiff"}


def _scan_images(root: str):
    files = []
    for dirpath, _dirnames, filenames in sorted(os.walk(root)):
        for fn in sorted(filenames):
            if os.path.splitext(fn)[1].lower() in _IMG_EXT:
                files.append(os.path.join(dirpath, fn))
    return files


def resize_crop_255(
    img: Image.Image,
    size_resize: Tuple[int, int] = (512, 512),
    size_crop: Tuple[int, int] = (256, 256),
    rng: Optional[random.Random] = None,
) -> np.ndarray:
    """Resize (bilinear, both dims forced) then random-crop, 0-255 float32.

    torchvision Resize((h,w)) forces both dims; RandomCrop picks a uniform
    top-left corner.  The reference's RNG is unseeded (datasets.py:44) —
    intentionally nondeterministic; pass ``rng`` for reproducibility.
    """
    rng = rng or random
    rh, rw = size_resize
    ch, cw = size_crop
    img = img.convert("RGB").resize((rw, rh), Image.BILINEAR)
    top = rng.randint(0, rh - ch) if rh > ch else 0
    left = rng.randint(0, rw - cw) if rw > cw else 0
    img = img.crop((left, top, left + cw, top + ch))
    return np.asarray(img, dtype=np.float32)


class ImageFolder:
    """Recursively lists images under ``root`` (class dirs or flat)."""

    def __init__(
        self,
        root: str,
        size_resize: Tuple[int, int] = (512, 512),
        size_crop: Tuple[int, int] = (256, 256),
        rng: Optional[random.Random] = None,
    ):
        self.root = root
        self.files = _scan_images(root)
        if not self.files:
            raise FileNotFoundError(f"no images under {root}")
        self.size_resize = size_resize
        self.size_crop = size_crop
        self.rng = rng

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int) -> np.ndarray:
        with Image.open(self.files[idx]) as img:
            return resize_crop_255(
                img, self.size_resize, self.size_crop, self.rng
            )
