"""Multi-scale VGG feature helpers (reference utilities.py:86-97)."""

from typing import Dict

import jax.numpy as jnp

from ..ops.resize import resize_bilinear


def feature_down_sample(feat: Dict[str, jnp.ndarray], last_layer: int) -> jnp.ndarray:
    """Bilinearly downsample relu1..k-1 to relu_k's size and channel-concat.

    feat: {"relu1_1", ...} NHWC maps. Matches reference utilities.py:86-97
    (torch bilinear semantics, no anti-aliasing).
    """
    size = feat[f"relu{last_layer}_1"].shape[1:3]
    parts = [
        resize_bilinear(feat[f"relu{i}_1"], size) for i in range(1, last_layer)
    ]
    parts.append(feat[f"relu{last_layer}_1"])
    return jnp.concatenate(parts, axis=-1)
