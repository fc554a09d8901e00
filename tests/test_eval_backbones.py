"""Golden tests for the eval backbones and their weight importers.

Pattern (VERDICT round-1 item 4): restate the torchvision architectures in
plain torch (tests/torch_backbones.py), randomise their weights, pipe the
``state_dict()`` through mhada_tpu's importers, and assert the JAX modules
reproduce the torch features.  Covers import_vgg19 / import_vgg16 /
import_lin_heads / import_inception end-to-end, so a transposed kernel or a
mis-indexed tap would fail here rather than silently corrupting every
LPIPS/SIFID/gram number.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests import torch_backbones as tb  # noqa: E402

RNG = np.random.default_rng(7)


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _assert_tap(got, ref_t, name, tol=1e-4):
    ref = ref_t.detach().numpy().transpose(0, 2, 3, 1)
    scale = max(1.0, float(np.abs(ref).max()))
    err = float(np.abs(np.asarray(got) - ref).max())
    assert err <= tol * scale, f"{name}: max err {err} (scale {scale})"


def test_vgg19_features_golden():
    from mhada_tpu.models import VGG19Features
    from mhada_tpu.interop.torch_import import import_vgg19

    ref = tb.VGG19Ref()
    tb._randomize(ref, seed=1)
    params = import_vgg19(_sd(ref))

    x_t = torch.rand(2, 3, 64, 72) * 255.0
    with torch.no_grad():
        taps_t = ref(x_t)
    feats = VGG19Features().apply({"params": params}, _nhwc(x_t))
    names = ["relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1"]
    for name, t in zip(names, taps_t):
        _assert_tap(feats[name], t, name)


def test_vgg16_lpips_trunk_golden():
    from mhada_tpu.evals.lpips import VGG16Features, import_vgg16

    ref = tb.VGG16Ref()
    tb._randomize(ref, seed=2)
    params = import_vgg16(_sd(ref))

    x_t = torch.rand(2, 3, 64, 64) * 2.0 - 1.0
    with torch.no_grad():
        taps_t = ref(x_t)
    taps = VGG16Features().apply({"params": params}, _nhwc(x_t))
    for i, (got, t) in enumerate(zip(taps, taps_t)):
        _assert_tap(got, t, f"tap{i}")


def test_lpips_full_golden():
    """End-to-end LPIPS value: scaling layer + trunk + unit-normalise +
    imported 1x1 heads + spatial average (lpips/lpips.py:115-161)."""
    from mhada_tpu.evals.lpips import (
        LPIPS_CHANNELS, import_vgg16, import_lin_heads, make_lpips_fn,
    )

    ref = tb.VGG16Ref()
    tb._randomize(ref, seed=3)
    heads_sd = {}
    lins_t = []
    for k, c in enumerate(LPIPS_CHANNELS):
        w = np.abs(RNG.standard_normal((1, c, 1, 1))).astype(np.float32) * 0.05
        heads_sd[f"lin{k}.model.1.weight"] = w
        lins_t.append(torch.from_numpy(w[0, :, 0, 0]))

    img0_t = torch.rand(2, 3, 64, 64) * 255.0
    img1_t = torch.rand(2, 3, 64, 64) * 255.0
    with torch.no_grad():
        ref_val = tb.lpips_forward(ref, lins_t, img0_t, img1_t).numpy()

    fn = make_lpips_fn(import_vgg16(_sd(ref)), import_lin_heads(heads_sd))
    got = np.asarray(fn(_nhwc(img0_t), _nhwc(img1_t)))
    np.testing.assert_allclose(got, ref_val, rtol=1e-4, atol=1e-6)


def test_inception_golden():
    from mhada_tpu.evals.inception import InceptionV3Features, import_inception

    ref = tb.InceptionV3Ref()
    tb._randomize(ref, seed=4)
    params = import_inception(_sd(ref))

    x_t = torch.rand(1, 3, 96, 96)
    with torch.no_grad():
        taps_t = ref(x_t)
    taps = InceptionV3Features(last_block=3).apply({"params": params}, _nhwc(x_t))
    assert len(taps) == 4
    for i, (got, t) in enumerate(zip(taps, taps_t)):
        _assert_tap(got, t, f"block{i}", tol=2e-4)
