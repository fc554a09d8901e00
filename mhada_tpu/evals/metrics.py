"""Image-quality metrics (reference eval.py:38-243).

Histogram metrics run in numpy on uint8 images (they are IO-bound);
SSIM and the VGG gram loss run jitted on device.  Behavioural quirks
preserved deliberately:

- histograms use +1 smoothing on raw bincounts (eval.py:45)
- ``nth_order_moment`` normalises bin *counts* by 255 (eval.py:119) — a quirk
  of the reference, kept for metric parity
- SSIM constants C1/C2 assume [0,1] inputs but images arrive 0-255
  (eval.py:189,229-238) — kept
- metric functions accept file paths and reload from disk (round-trip through
  the codec is part of the defined behaviour, SURVEY.md §3.5)
"""

from functools import lru_cache
from typing import Union

import numpy as np
import jax
import jax.numpy as jnp


ImageLike = Union[str, np.ndarray]


def _load_bgr(img: ImageLike) -> np.ndarray:
    if isinstance(img, str):
        import cv2

        out = cv2.imread(img)
        if out is None:
            raise FileNotFoundError(img)
        return out
    return img


def _load_rgb(img: ImageLike) -> np.ndarray:
    if isinstance(img, str):
        import cv2

        return cv2.cvtColor(_load_bgr(img), cv2.COLOR_BGR2RGB)
    return img


def _load_gray(img: ImageLike) -> np.ndarray:
    import cv2

    return cv2.cvtColor(_load_bgr(img), cv2.COLOR_BGR2GRAY)


def compute_histogram(img: np.ndarray, channel=None) -> np.ndarray:
    """256-bin histogram with +1 smoothing (eval.py:38-46)."""
    data = img.flatten() if channel is None else img[:, :, channel].flatten()
    return np.bincount(data, minlength=256) + 1


def kl_divergence(path0: ImageLike, path1: ImageLike) -> float:
    """Mean per-channel histogram KL divergence (eval.py:49-67)."""
    import scipy.stats

    img = _load_bgr(path0)
    s = _load_bgr(path1)
    kl = sum(
        scipy.stats.entropy(
            compute_histogram(img, ch), compute_histogram(s, ch)
        )
        for ch in range(3)
    )
    return float(kl) / 3.0


def nth_order_moment(path0: ImageLike) -> float:
    """2nd-order moment of the gray histogram (eval.py:111-129)."""
    hist = compute_histogram(_load_gray(path0)).astype(np.float64)
    hist_p = hist / hist.sum()
    hist_n = hist / 255.0
    return float(np.sum((hist_n - hist_n.mean()) ** 2 * hist_p))


def uniformity(path0: ImageLike) -> float:
    """Histogram uniformity sum(p^2) (eval.py:132-146)."""
    hist = compute_histogram(_load_gray(path0)).astype(np.float64)
    p = hist / hist.sum()
    return float(np.sum(p**2))


def average_entropy(path0: ImageLike) -> float:
    """Shannon entropy of the gray histogram (eval.py:149-164)."""
    hist = compute_histogram(_load_gray(path0)).astype(np.float64)
    p = hist / hist.sum()
    p = p[p > 0]
    return float(-np.sum(p * np.log2(p)))


@lru_cache(maxsize=4)
def _gaussian_kernel(window_size: int, sigma: float) -> np.ndarray:
    x = np.linspace(-(window_size // 2), window_size // 2, window_size)
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


@jax.jit
def _ssim_jit(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """img1/img2: (B, H, W, C) 0-255 (constants assume [0,1]; kept)."""
    window_size, sigma = 11, 1.5
    c = img1.shape[-1]
    k2d = jnp.asarray(_gaussian_kernel(window_size, sigma))
    # depthwise conv: (kh, kw, 1, C) with feature_group_count = C
    kernel = jnp.tile(k2d[:, :, None, None], (1, 1, 1, c))
    pad = window_size // 2

    def blur(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu1 = blur(img1)
    mu2 = blur(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blur(img1 * img1) - mu1_sq
    s2 = blur(img2 * img2) - mu2_sq
    s12 = blur(img1 * img2) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    num = (2 * mu1_mu2 + C1) * (2 * s12 + C2)
    den = (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    return jnp.mean(num / den)


def ssim(path0: ImageLike, path1: ImageLike) -> float:
    """Gaussian-window SSIM (eval.py:167-243)."""
    a = _load_rgb(path0).astype(np.float32)
    b = _load_rgb(path1).astype(np.float32)
    return float(_ssim_jit(jnp.asarray(a)[None], jnp.asarray(b)[None]))


def _gram(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C, C) / (H*W) (eval.py:70-75)."""
    b, h, w, c = x.shape
    f = x.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f) / (h * w)


def gram_loss(path0: ImageLike, path1: ImageLike, vgg_apply) -> float:
    """Mean MSE of VGG19 gram matrices over the 5 tap layers (eval.py:78-108).

    ``vgg_apply``: callable (B, H, W, 3) 0-255 -> {"relu1_1"...} features.
    """
    a = jnp.asarray(_load_rgb(path0).astype(np.float32))[None]
    b = jnp.asarray(_load_rgb(path1).astype(np.float32))[None]
    fa = vgg_apply(a)
    fb = vgg_apply(b)
    loss = 0.0
    for i in (1, 2, 3, 4, 5):
        ga = _gram(fa[f"relu{i}_1"])
        gb = _gram(fb[f"relu{i}_1"])
        loss += jnp.mean(jnp.square(ga - gb))
    return float(loss) / 5.0
