"""VGG19 feature extractor (loss / eval network).

Parity with reference network/vgg19.py:15-70: torchvision VGG19 ``features``
sliced at relu1_1..relu5_1 (slice boundaries 0-2 / 2-7 / 7-12 / 12-21 / 21-30),
with the ImageNet normalisation (x/255 - mean)/std applied inside the module.
Used only as a frozen loss/eval network — pretrained weights are imported from
a torchvision ``.pth`` via ``mhada_tpu.interop`` when available; otherwise the
module initialises randomly (sufficient for compile/shape tests, NOT for
training parity).

NHWC; zero-padded 3x3 convs + 2x2 max pools (torch floor mode).
"""

import jax.numpy as jnp
import flax.linen as nn

from .layers import TorchConv
from ..ops.pad_conv import max_pool2d

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# (name, out_channels); "pool" entries are 2x2 max pools.
_VGG19_PREFIX = [
    ("conv1_1", 64),
    ("conv1_2", 64),
    ("pool", 0),
    ("conv2_1", 128),
    ("conv2_2", 128),
    ("pool", 0),
    ("conv3_1", 256),
    ("conv3_2", 256),
    ("conv3_3", 256),
    ("conv3_4", 256),
    ("pool", 0),
    ("conv4_1", 512),
    ("conv4_2", 512),
    ("conv4_3", 512),
    ("conv4_4", 512),
    ("pool", 0),
    ("conv5_1", 512),
]

TAPS = {"conv1_1": "relu1_1", "conv2_1": "relu2_1", "conv3_1": "relu3_1",
        "conv4_1": "relu4_1", "conv5_1": "relu5_1"}


def imagenet_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """0-255 NHWC -> ImageNet-normalised (reference vgg19.py:6-12)."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
    return (x / 255.0 - mean) / std


class VGG19Classifier(nn.Module):
    """VGG19 tail: features[30:37] + avgpool + classifier head (reference
    vgg19.py:73-93; dead code in the reference, kept for component parity).

    Input: relu5_1 feature maps (B, H, W, 512); output: (B, 1000) logits.
    """

    @nn.compact
    def __call__(self, x):
        from .layers import TorchLinear

        # features[30:37]: conv5_2, relu, conv5_3, relu, conv5_4, relu, pool
        for name in ("conv5_2", "conv5_3", "conv5_4"):
            x = nn.relu(TorchConv(512, 3, padding=1, name=name)(x))
        x = max_pool2d(x)
        # AdaptiveAvgPool2d((7,7)) — a linear map per axis, applied as
        # matmuls (torch bin rule: [floor(o*H/7), ceil((o+1)*H/7))).
        if x.shape[1:3] != (7, 7):
            import numpy as np
            import jax.numpy as jnp

            def pool_matrix(size, out):
                m = np.zeros((out, size), np.float32)
                for o in range(out):
                    a = (o * size) // out
                    b = -((-(o + 1) * size) // out)
                    m[o, a:b] = 1.0 / (b - a)
                return jnp.asarray(m)

            rh = pool_matrix(x.shape[1], 7).astype(x.dtype)
            rw = pool_matrix(x.shape[2], 7).astype(x.dtype)
            x = jnp.einsum("oh,bhwc->bowc", rh, x)
            x = jnp.einsum("pw,bowc->bopc", rw, x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(TorchLinear(4096, name="fc1")(x))
        x = nn.relu(TorchLinear(4096, name="fc2")(x))
        return TorchLinear(1000, name="fc3")(x)


class VGG19Features(nn.Module):
    """Returns {"relu1_1", ..., "relu5_1"} feature maps (NHWC)."""

    @nn.compact
    def __call__(self, x):
        x = imagenet_normalize(x)
        feats = {}
        for name, ch in _VGG19_PREFIX:
            if name == "pool":
                x = max_pool2d(x)
            else:
                x = TorchConv(ch, 3, padding=1, name=name)(x)
                x = nn.relu(x)
                if name in TAPS:
                    feats[TAPS[name]] = x
        return feats
