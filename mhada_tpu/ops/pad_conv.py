"""Convolution primitives in NHWC with torch-compatible semantics.

The reference's conv building blocks are reflection-padded 3x3 convs
(reference network/conv.py:23-33) and zero-padded VGG convs.  We keep NHWC
(TPU-native) layout; weights are HWIO.  ``jnp.pad(mode="reflect")`` matches
``nn.ReflectionPad2d`` (edge-exclusive reflection).
"""

import jax.numpy as jnp
from jax import lax


def reflect_pad2d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """NHWC reflection padding (edge-exclusive, torch ReflectionPad2d)."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
    padding: str | int = 0,
    preferred_dtype=jnp.float32,
) -> jnp.ndarray:
    """NHWC conv. ``w``: (kh, kw, C_in, C_out); ``padding``: int zero-pad or 'SAME'."""
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    # Only request an upcast output for f32 inputs (no-op): with bf16
    # operands a f32 preferred_element_type breaks the conv transpose rule
    # under AD (f32 cotangent x bf16 kernel), and the TPU MXU accumulates
    # in f32 internally either way — only the output rounding differs.
    preferred = preferred_dtype if x.dtype == preferred_dtype else None
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def conv2d_reflect(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
) -> jnp.ndarray:
    """Reflection-padded conv: pad = floor(k/2), valid conv (reference Conv)."""
    k = w.shape[0]
    x = reflect_pad2d(x, k // 2)
    return conv2d(x, w, b, stride=stride, padding=0)


def max_pool2d(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """NHWC max pool (VGG), floor-mode like torch MaxPool2d default."""
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
