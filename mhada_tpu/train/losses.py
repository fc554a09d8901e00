"""Training losses (reference lossfn.py:7-86).

All feature dicts are {"relu1_1".."relu5_1"} NHWC maps from VGG19Features;
images are NHWC 0-255.  MSE is mean-reduced like ``nn.MSELoss`` unless a loss
defines its own masked normalisation.
"""

from typing import Dict

import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from ..ops.warp import warp
from ..models.adaformer import adaattn_for_loss
from ..utils.features import feature_down_sample

_LAYERS = ["relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1"]


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(a - b))


def global_style_loss(fcs: Dict, fs: Dict) -> jnp.ndarray:
    """AdaIN statistics matching on VGG features (lossfn.py:7-23).

    Uses *unbiased* std over the spatial extent, matching torch
    ``Tensor.std``'s Bessel correction.
    """
    loss = 0.0
    for name in _LAYERS:
        a = fcs[name]
        b = fs[name]
        n = a.shape[1] * a.shape[2]
        a_mean = jnp.mean(a, axis=(1, 2))
        b_mean = jnp.mean(b, axis=(1, 2))
        a_var = jnp.var(a, axis=(1, 2)) * (n / (n - 1))
        b_var = jnp.var(b, axis=(1, 2)) * (n / (n - 1))
        loss += mse(a_mean, b_mean) + mse(jnp.sqrt(a_var), jnp.sqrt(b_var))
    return loss


def local_feature_loss(
    fc: Dict, fs: Dict, fcs: Dict, activation: str = "softmax"
) -> jnp.ndarray:
    """MSE against parameter-free AdaAttN targets at relu3/4/5_1
    (lossfn.py:26-34); targets use multi-scale Q/K concats."""
    loss = 0.0
    for i in (3, 4, 5):
        c_1x = feature_down_sample(fc, i)
        s_1x = feature_down_sample(fs, i)
        target = adaattn_for_loss(
            fc[f"relu{i}_1"], fs[f"relu{i}_1"], c_1x, s_1x, activation
        )
        loss += mse(fcs[f"relu{i}_1"], target)
    return loss


def identity_loss_1(cc, c, ss, s) -> jnp.ndarray:
    """Pixel-space reconstruction identity (lossfn.py:37-38)."""
    return mse(cc, c) + mse(ss, s)


def identity_loss_2(fcc: Dict, fc: Dict, fss: Dict, fs: Dict) -> jnp.ndarray:
    """VGG-feature identity over all 5 layers (lossfn.py:41-47)."""
    loss = 0.0
    for name in _LAYERS:
        loss += mse(fcc[name], fc[name]) + mse(fss[name], fs[name])
    return loss


def output_level_temporal_loss(c1, c2, cs1, cs2, flow, mask) -> jnp.ndarray:
    """Flow-warped output consistency vs luma input change (lossfn.py:50-66).

    c*, cs*: (B, H, W, 3); flow: (B, H, W, 2); mask: (B, H, W).
    """
    warped_c1 = warp(c1, flow)
    warped_cs1 = warp(cs1, flow)
    diff = c2 - warped_c1
    luma = (
        0.2126 * diff[..., 0] + 0.7152 * diff[..., 1] + 0.0722 * diff[..., 2]
    )
    input_term = luma[..., None]  # broadcast over 3 channels
    output_term = cs2 - warped_cs1
    m = mask[..., None]
    per_elem = jnp.square(output_term - input_term) * m
    nnz = jnp.sum(m) * c2.shape[-1]
    return _masked_mean(per_elem, nnz)


def feature_level_temporal_loss(f1, f2, flow, mask) -> jnp.ndarray:
    """Flow-warped consistency of pre-decoder fcs maps (lossfn.py:69-86).

    f1, f2: (B, h, w, C); flow: (B, H, W, 2) pixel flow at image res;
    mask: (B, H, W).
    """
    fh, fw = f1.shape[1:3]
    flow_r = resize_bilinear(flow, (fh, fw))
    scale = jnp.asarray(
        [fw / flow.shape[2], fh / flow.shape[1]], dtype=flow.dtype
    )
    flow_r = flow_r * scale
    warped_f1 = warp(f1, flow_r)
    fmask = resize_bilinear(mask[..., None], (fh, fw))
    fmask = (fmask > 0).astype(f1.dtype)
    per_elem = jnp.square(f2 - warped_f1) * fmask
    nnz = jnp.sum(fmask) * f1.shape[-1]
    return _masked_mean(per_elem, nnz)


def _masked_mean(per_elem, nnz) -> jnp.ndarray:
    """sum(per_elem)/nnz, defined as 0 when the mask is empty.

    Deliberate robustness deviation: the reference's torch expression
    (lossfn.py:66,86) yields NaN on an all-zero mask — impossible on its
    real datasets, but one degenerate sample (fully occluded flow, or a
    sparse mask whose support the 8x feature-grid downsample misses
    entirely) would poison the whole run with NaN gradients.  An empty
    mask means "no temporal signal", i.e. zero loss."""
    return jnp.where(nnz > 0, jnp.sum(per_elem) / jnp.maximum(nnz, 1), 0.0)
