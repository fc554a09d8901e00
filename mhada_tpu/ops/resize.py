"""Bilinear resize with exact PyTorch ``align_corners=False`` semantics.

The reference uses ``F.interpolate(mode="bilinear", align_corners=False)`` in
four places (decoder 2x upsampling, positional-embedding regridding,
multi-scale VGG feature downsampling, flow/mask resizing — see reference
network/conv.py:71, network/vit.py:92, utilities.py:92, lossfn.py:71).  JAX's
``jax.image.resize`` anti-aliases on downsample, which PyTorch does not, so we
implement the torch sampling rule directly.

TPU-first design: bilinear resampling along an axis is a linear map, so we
materialise the (out, in) interpolation matrix once per shape (cached — shapes
are static under jit) and apply it as two dense matmuls.  Dense matmuls land on
the MXU and are far faster than gather lowering on TPU for the sizes used here
(H, W <= 1024).
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=256)
def _resize_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation matrix, torch half-pixel rule.

    src = max(0, (i + 0.5) * (in/out) - 0.5); taps floor(src), floor(src)+1
    clamped to the valid range (PyTorch's ``area_pixel_compute_source_index``
    with ``align_corners=False``).
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    i = np.arange(out_size, dtype=np.float64)
    src = np.maximum((i + 0.5) * scale - 0.5, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float64)
    w0 = 1.0 - w1
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    mat[np.arange(out_size), i0] += w0
    mat[np.arange(out_size), i1] += w1
    return mat.astype(np.float32)


def resize_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    return jnp.asarray(_resize_matrix_np(in_size, out_size))


def resize_bilinear(x: jnp.ndarray, out_hw: tuple) -> jnp.ndarray:
    """Resize NHWC (or HWC) tensor to ``out_hw`` with torch bilinear semantics.

    Matches ``F.interpolate(x, size=out_hw, mode="bilinear",
    align_corners=False)`` bit-for-bit up to f32 accumulation order.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    oh, ow = out_hw
    dtype = x.dtype
    rh = resize_matrix(h, oh).astype(dtype)
    rw = resize_matrix(w, ow).astype(dtype)
    # (B,H,W,C): contract H then W on the MXU.
    y = jnp.einsum("oh,bhwc->bowc", rh, x)
    y = jnp.einsum("pw,bowc->bopc", rw, y)
    return y[0] if squeeze else y


def _up2_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 2x bilinear upsample along one axis.

    With align_corners=False and scale 2, src(o) = o/2 - 0.25, so every
    output is a fixed 2-tap blend: even outputs 0.25*x[i-1] + 0.75*x[i],
    odd outputs 0.75*x[i] + 0.25*x[i+1] (edge-clamped) — pure VPU work
    instead of a dense interpolation matmul.
    """
    n = x.shape[axis]

    def take(idx):
        return jax.lax.slice_in_dim(x, idx[0], idx[1], axis=axis)

    prev = jnp.concatenate([take((0, 1)), take((0, n - 1))], axis=axis)
    nxt = jnp.concatenate([take((1, n)), take((n - 1, n))], axis=axis)
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    stacked = jnp.stack([even, odd], axis=axis + 1)  # (..., n, 2, ...)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return stacked.reshape(new_shape).astype(x.dtype)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample (decoder path), NHWC; exact torch semantics."""
    return _up2_axis(_up2_axis(x, 1), 2)
