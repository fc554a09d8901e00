"""Host-side image I/O in the reference's pixel conventions.

Pixels are float32 RGB in [0, 255], NHWC on device (reference utilities.py:
11-52 keeps 0-255 tensors end-to-end).
"""

import os
from typing import Optional, Tuple

import numpy as np
from PIL import Image


def to_tensor255(img) -> np.ndarray:
    """PIL image / HWC uint8 array -> float32 HWC in [0, 255]."""
    return np.asarray(img, dtype=np.float32)


def to_uint8_pixels(arr) -> np.ndarray:
    """Lossless-by-construction uint8 cast for the uint8-shipping train path.

    The loaders yield integral float pixels in [0, 255] (PIL decode x255,
    image_folder.py), so today this equals ``astype(uint8)`` — but a bare
    cast silently wraps/truncates if a future augmentation ever yields
    out-of-range or fractional values.  Round + clip keeps the cast safe.
    """
    a = np.asarray(arr)
    if a.dtype == np.uint8:
        return a
    if np.issubdtype(a.dtype, np.floating):
        a = np.rint(a)
    return np.clip(a, 0, 255).astype(np.uint8)


def load_image(
    path: str, size_hw: Optional[Tuple[int, int]] = None
) -> np.ndarray:
    """Load RGB image, optional PIL-bilinear resize to (H, W); float32 0-255.

    Matches reference infer_image.py:69-77 (PIL Image.BILINEAR resize).
    """
    img = Image.open(path).convert("RGB")
    if size_hw is not None:
        img = img.resize((size_hw[1], size_hw[0]), Image.BILINEAR)
    return to_tensor255(img)


def save_image(path: str, arr: np.ndarray) -> None:
    """Save HWC float array (0-255, already clamped) as an image file."""
    a = np.asarray(arr)
    if a.ndim == 4:
        a = a[0]
    Image.fromarray(a.astype(np.uint8)).save(path)


def cv2_to_tensor(
    img: np.ndarray,
    resize: Optional[Tuple[int, int]] = None,
    keep_uint8: bool = False,
) -> np.ndarray:
    """BGR frame (cv2) -> float32 RGB HWC 0-255, optional INTER_AREA resize
    to (width, height) — reference utilities.py:43-52.

    ``keep_uint8`` skips the float conversion (values are integral either
    way): the transcode path ships uint8 over the host->device link and
    casts on-chip — 4x less transfer on a tunnel-attached TPU."""
    import cv2

    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if resize is not None:
        img = cv2.resize(img, resize, interpolation=cv2.INTER_AREA)
    return img if keep_uint8 else img.astype(np.float32)


def list_files(directory: str):
    return sorted(f.path for f in os.scandir(directory) if f.is_file())


def list_folders(directory: str):
    return sorted(f.path for f in os.scandir(directory) if f.is_dir())


def mkdir(directory: str, delete_existing_files: bool = False) -> None:
    os.makedirs(directory, exist_ok=True)
    if delete_existing_files:
        for f in list_files(directory):
            os.remove(f)


def visualize_flow(flow: np.ndarray) -> np.ndarray:
    """HSV rendering of a flow field (reference utilities.py:154-165).

    flow: (H, W, 2) -> BGR uint8 image (hue = direction, value = magnitude).
    """
    import cv2

    hsv = np.zeros((flow.shape[0], flow.shape[1], 3), dtype=np.uint8)
    hsv[..., 1] = 255
    mag, ang = cv2.cartToPolar(
        np.asarray(flow[..., 0], np.float32),
        np.asarray(flow[..., 1], np.float32),
    )
    hsv[..., 0] = ang * 180 / np.pi / 2
    hsv[..., 2] = cv2.normalize(mag, None, 0, 255, cv2.NORM_MINMAX)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)


def print_param_tree(params, prefix: str = "") -> None:
    """Name/shape listing of a param pytree (reference utilities.py:76-83)."""
    if hasattr(params, "items"):
        for k, v in params.items():
            print_param_tree(v, f"{prefix}.{k}" if prefix else k)
    else:
        print(f"{prefix}: {tuple(params.shape)}")
