"""LPIPS perceptual distance (reference vendored lpips/ package, v0.1, vgg).

Pipeline (reference lpips/lpips.py:129-161): RGB [0,255] -> [-1,1] ->
ScalingLayer (fixed shift/scale) -> vgg16 features at relu{1_2,2_2,3_3,4_3,
5_3} -> channel-unit-normalise -> squared diff -> per-layer 1x1 linear heads
(no bias) -> spatial average -> sum.

Weights: torchvision VGG16 .pth (trunk) + the LPIPS v0.1 linear heads .pth.
Both are imported via ``load_lpips_params``; this sandbox has no torchvision
weight cache, so runs gate on the files being provided.
"""

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..models.layers import TorchConv
from ..ops.pad_conv import max_pool2d

# (name, out_ch, torchvision features index)
_VGG16_LAYERS = [
    ("conv1_1", 64, 0), ("conv1_2", 64, 2), ("pool", 0, None),
    ("conv2_1", 128, 5), ("conv2_2", 128, 7), ("pool", 0, None),
    ("conv3_1", 256, 10), ("conv3_2", 256, 12), ("conv3_3", 256, 14),
    ("pool", 0, None),
    ("conv4_1", 512, 17), ("conv4_2", 512, 19), ("conv4_3", 512, 21),
    ("pool", 0, None),
    ("conv5_1", 512, 24), ("conv5_2", 512, 26), ("conv5_3", 512, 28),
]

_TAPS = {"conv1_2": 0, "conv2_2": 1, "conv3_3": 2, "conv4_3": 3, "conv5_3": 4}
LPIPS_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """vgg16 sliced at the 5 LPIPS taps (lpips/pretrained_networks.py:98-135)."""

    @nn.compact
    def __call__(self, x):
        taps = [None] * 5
        for name, ch, _ in _VGG16_LAYERS:
            if name == "pool":
                x = max_pool2d(x)
            else:
                x = nn.relu(TorchConv(ch, 3, padding=1, name=name)(x))
                if name in _TAPS:
                    taps[_TAPS[name]] = x
        return taps


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


def make_lpips_fn(vgg_params: Dict, lin_weights):
    """Jitted LPIPS distance on (B, H, W, 3) RGB 0-255 images.

    lin_weights: list of 5 (C_l,) arrays (the 1x1 no-bias head weights).
    """
    model = VGG16Features()
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    lins = [jnp.asarray(w) for w in lin_weights]

    @jax.jit
    def fn(img0, img1):
        def prep(x):
            x = x / (255.0 / 2.0) - 1.0  # im2tensor (lpips/__init__.py:84-86)
            return (x - shift) / scale  # ScalingLayer (lpips.py:164-171)

        f0 = model.apply({"params": vgg_params}, prep(img0))
        f1 = model.apply({"params": vgg_params}, prep(img1))
        val = 0.0
        for t0, t1, w in zip(f0, f1, lins):
            d = jnp.square(_unit_normalize(t0) - _unit_normalize(t1))
            val += jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
        return val

    return fn


def import_vgg16(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision vgg16 ``features.{i}.weight`` state_dict -> params."""
    p = {}
    for name, _ch, idx in _VGG16_LAYERS:
        if name == "pool":
            continue
        w = sd[f"features.{idx}.weight"]
        p[name] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": sd[f"features.{idx}.bias"],
        }
    return p


def import_lin_heads(sd: Dict[str, np.ndarray]):
    """LPIPS v0.1 heads: ``lin{k}.model.1.weight`` (1, C, 1, 1) -> (C,).

    Head weights are clamped to >= 0 at use in the original trainer; the
    shipped v0.1 weights are already non-negative.
    """
    out = []
    for k in range(5):
        key = f"lin{k}.model.1.weight"
        if key not in sd:
            key = f"lins.{k}.model.1.weight"
        out.append(np.asarray(sd[key])[0, :, 0, 0])
    return out


def load_lpips_params(vgg16_path: str, heads_path: str):
    """Read both .pth files -> (vgg_params, lin_weights)."""
    from ..interop import load_pth

    return import_vgg16(load_pth(vgg16_path)), import_lin_heads(
        load_pth(heads_path)
    )


def lpips_distance(path0: str, path1: str, vgg16_path: str, heads_path: str) -> float:
    """File-path convenience wrapper (reference eval.py:19-35 semantics:
    images loaded RGB at native size)."""
    import cv2

    img0 = cv2.imread(path0)[:, :, ::-1].astype(np.float32)
    img1 = cv2.imread(path1)[:, :, ::-1].astype(np.float32)
    vgg_params, lins = load_lpips_params(vgg16_path, heads_path)
    fn = make_lpips_fn(vgg_params, lins)
    return float(fn(jnp.asarray(img0)[None], jnp.asarray(img1)[None])[0])
