"""Image-training datasets (reference datasets.py:17-69).

CocoWikiArt pairs each COCO content image with a uniformly random WikiArt
style (reference datasets.py:33-45 — style pick intentionally unseeded unless
``seed`` is given).
"""

import os
import random
from typing import Optional, Tuple

import numpy as np

from .image_folder import ImageFolder


class CocoWikiArt:
    def __init__(
        self,
        image_size: Tuple[int, int] = (256, 256),
        coco_path: str = "../datasets/coco",
        wikiart_path: str = "../datasets/WikiArt",
        seed: Optional[int] = None,
    ):
        rng = random.Random(seed) if seed is not None else None
        self.coco = ImageFolder(coco_path, (512, 512), image_size, rng)
        self.wikiart = ImageFolder(wikiart_path, (512, 512), image_size, rng)
        self._rng = rng or random

    def __len__(self):
        return len(self.coco)

    def __getitem__(self, idx: int):
        style_idx = self._rng.randint(0, len(self.wikiart) - 1)
        return self.coco[idx], self.wikiart[style_idx]


class ImageNet1k:
    """ImageNet with one-hot labels (reference datasets.py:48-69; pairs with
    the reference's dead VGG19_Classifier — kept for component parity)."""

    def __init__(
        self,
        image_size: Tuple[int, int] = (256, 256),
        path: str = "../datasets/ImageNet1K",
        mode: str = "train",
        seed: Optional[int] = None,
    ):
        root = os.path.join(path, mode)
        rng = random.Random(seed) if seed is not None else None
        if mode == "train":
            self.ds = ImageFolder(root, (300, 300), image_size, rng)
        elif mode == "val":
            self.ds = ImageFolder(root, (256, 256), (256, 256), rng)
        else:
            raise ValueError("Mode must be 'train' or 'val'.")
        # class = first-level subdirectory name
        classes = sorted(
            {os.path.relpath(f, root).split(os.sep)[0] for f in self.ds.files}
        )
        self._class_idx = {c: i for i, c in enumerate(classes)}
        self._root = root

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, idx: int):
        img = self.ds[idx]
        cls = os.path.relpath(self.ds.files[idx], self._root).split(os.sep)[0]
        label = np.zeros(1000, np.float32)
        label[self._class_idx[cls]] = 1.0
        return img, label
