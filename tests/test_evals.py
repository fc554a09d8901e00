"""Evaluation stack: histogram metrics vs oracles, SSIM vs the reference
formula (restated in torch), LPIPS/SIFID wiring with random weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from mhada_tpu.evals import metrics

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def image_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    a = RNG.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    b = RNG.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    pa, pb = str(d / "a.png"), str(d / "b.png")
    Image.fromarray(a).save(pa)
    Image.fromarray(b).save(pb)
    return pa, pb, a, b


def test_histogram_plus_one(image_pair):
    _, _, a, _ = image_pair
    h = metrics.compute_histogram(a, 0)
    assert h.sum() == a[:, :, 0].size + 256
    assert h.min() >= 1


def test_kl_properties(image_pair):
    pa, pb, _, _ = image_pair
    assert metrics.kl_divergence(pa, pa) == 0.0
    assert metrics.kl_divergence(pa, pb) > 0.0


def test_entropy_uniformity_moment(image_pair):
    pa, _, _, _ = image_pair
    e = metrics.average_entropy(pa)
    u = metrics.uniformity(pa)
    m = metrics.nth_order_moment(pa)
    assert 0 < e <= 8.0
    assert 1 / 256 <= u <= 1.0
    assert m >= 0
    # uniform-ish noise: entropy near 8 bits, uniformity near 1/256
    assert e > 7.0
    assert u < 2 / 256


def test_ssim_matches_reference_formula(image_pair):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    pa, pb, a, b = image_pair

    # reference eval.py:167-223 restated
    def torch_ssim(i1, i2):
        ws, sigma, C = 11, 1.5, 3
        _1d = torch.linspace(-(ws // 2), ws // 2, ws)
        g = torch.exp(-(_1d**2) / (2 * sigma**2))
        g = g / g.sum()
        k = (g[:, None] @ g[None, :]).expand(C, 1, ws, ws).contiguous()
        conv = lambda x: F.conv2d(x, k, padding=ws // 2, groups=C)
        mu1, mu2 = conv(i1), conv(i2)
        s1 = conv(i1 * i1) - mu1**2
        s2 = conv(i2 * i2) - mu2**2
        s12 = conv(i1 * i2) - mu1 * mu2
        C1, C2 = 0.01**2, 0.03**2
        num = (2 * mu1 * mu2 + C1) * (2 * s12 + C2)
        den = (mu1**2 + mu2**2 + C1) * (s1 + s2 + C2)
        return float((num / den).mean())

    i1 = torch.from_numpy(a.astype(np.float32).transpose(2, 0, 1))[None]
    i2 = torch.from_numpy(b.astype(np.float32).transpose(2, 0, 1))[None]
    ref = torch_ssim(i1, i2)
    got = metrics.ssim(pa, pb)
    np.testing.assert_allclose(got, ref, rtol=1e-4)
    np.testing.assert_allclose(metrics.ssim(pa, pa), 1.0, rtol=1e-5)


def test_gram_loss_zero_for_identical(image_pair):
    pa, pb, _, _ = image_pair
    from mhada_tpu.models import VGG19Features

    vgg = VGG19Features()
    params = vgg.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 80, 3)))["params"]
    apply = lambda x: vgg.apply({"params": params}, x)
    assert metrics.gram_loss(pa, pa, apply) == 0.0
    assert metrics.gram_loss(pa, pb, apply) > 0.0


def test_lpips_wiring(image_pair):
    pa, pb, a, b = image_pair
    from mhada_tpu.evals.lpips import VGG16Features, make_lpips_fn, LPIPS_CHANNELS

    model = VGG16Features()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    lins = [np.abs(RNG.standard_normal(c)).astype(np.float32) * 0.01
            for c in LPIPS_CHANNELS]
    fn = make_lpips_fn(params, lins)
    x = jnp.asarray(a.astype(np.float32))[None]
    y = jnp.asarray(b.astype(np.float32))[None]
    assert float(fn(x, x)[0]) == 0.0
    assert float(fn(x, y)[0]) > 0.0


def test_sifid_wiring(image_pair):
    pa, pb, _, _ = image_pair
    from mhada_tpu.evals.inception import InceptionV3Features
    from mhada_tpu.evals.sifid import SIFID

    model = InceptionV3Features(last_block=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))["params"]
    ev = SIFID.__new__(SIFID)
    ev.block = 1
    ev.model = model
    ev.params = params
    d_same = ev(pa, pa)
    d_diff = ev(pa, pb)
    assert d_same < 1e-6
    assert d_diff > d_same


def test_inception_full_shapes():
    from mhada_tpu.evals.inception import InceptionV3Features

    model = InceptionV3Features(last_block=3)
    x = jnp.zeros((1, 128, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    taps = model.apply({"params": params}, x)
    assert [t.shape[-1] for t in taps] == [64, 192, 768, 2048]


def test_frechet_distance_rank_deficient_stabilisation():
    """Pin the sqrtm-stabilisation path (reference SIFID/sifid_score.py:
    128-182): rank-deficient covariances — the norm at SIFID's tiny
    per-location sample counts — must produce a finite, non-negative
    distance via the eps-offset retry / real-part extraction, and the
    diagonal case must match the closed form."""
    from mhada_tpu.evals.sifid import calculate_frechet_distance

    rng = np.random.default_rng(0)

    # rank-1 covariance from 2 samples in 8-d: sqrtm(s1 @ s2) is singular
    a = rng.normal(size=(2, 8))
    b = rng.normal(size=(2, 8))
    s1 = np.cov(a, rowvar=False)
    s2 = np.cov(b, rowvar=False)
    d = calculate_frechet_distance(a.mean(0), s1, b.mean(0), s2)
    assert np.isfinite(d) and d > 0

    # identical rank-deficient gaussians -> ~0 (stabilisation must not
    # inject spurious distance beyond the eps offset)
    d0 = calculate_frechet_distance(a.mean(0), s1, a.mean(0), s1.copy())
    assert np.isfinite(d0) and abs(d0) < 1e-6

    # exactly-zero covariance: trace terms vanish, distance = ||mu diff||^2
    z = np.zeros((4, 4))
    mu1, mu2 = np.arange(4.0), np.zeros(4)
    d_z = calculate_frechet_distance(mu1, z, mu2, z)
    assert d_z == pytest.approx(float(mu1 @ mu1), abs=1e-6)

    # diagonal closed form: ||dmu||^2 + sum(v1 + v2 - 2 sqrt(v1 v2))
    v1 = np.array([1.0, 2.0, 3.0])
    v2 = np.array([0.5, 2.0, 4.0])
    dmu = np.array([1.0, -1.0, 0.5])
    expect = float(dmu @ dmu + np.sum(v1 + v2 - 2 * np.sqrt(v1 * v2)))
    got = calculate_frechet_distance(dmu, np.diag(v1), np.zeros(3), np.diag(v2))
    assert got == pytest.approx(expect, rel=1e-9)
