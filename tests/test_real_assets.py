"""Exercise the reference's REAL bundled binary assets (VERDICT r2 item 1).

The reference vendors genuine torch-produced LPIPS v0.1 linear-head
checkpoints (reference lpips/lpips.py:115-124, lpips/weights/v0.1/*.pth)
and 20 content + 47 style demo JPEGs (reference infer_image_all.py:42-66).
These are the only real torch pickles and real photographs in the sandbox;
every other golden test runs on synthetic fixtures.  Here the torch-free
.pth reader, the LPIPS head importer, the JPEG codec path, and the
stylize/metrics stack all run against the genuine artifacts.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mhada_tpu.config import ModelConfig
from mhada_tpu.train.train_image import build_models
from mhada_tpu.infer.image import init_inference_params
from mhada_tpu.utils.image_io import load_image, list_files

REF = "/root/reference/MHAdaSTr"
LPIPS_DIR = os.path.join(REF, "lpips", "weights", "v0.1")
CONTENTS = os.path.join(REF, "contents")
STYLES = os.path.join(REF, "styles")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference assets not mounted"
)

# per-trunk head widths, reference lpips/pretrained_networks.py:6-181
_HEAD_WIDTHS = {
    "vgg": (64, 128, 256, 512, 512),
    "alex": (64, 192, 384, 256, 256),
    "squeeze": (64, 128, 256, 384, 384, 512, 512),
}


@pytest.mark.parametrize("net", ["vgg", "alex", "squeeze"])
def test_real_lpips_pth_through_torchfree_reader(net):
    """A genuine torch zip-pickle (storage records, BUILD state) round-trips
    through the torch-free reader with the exact v0.1 head layout."""
    from mhada_tpu.interop import load_pth

    sd = load_pth(os.path.join(LPIPS_DIR, f"{net}.pth"))
    widths = _HEAD_WIDTHS[net]
    assert sorted(sd) == [f"lin{k}.model.1.weight" for k in range(len(widths))]
    for k, c in enumerate(widths):
        w = np.asarray(sd[f"lin{k}.model.1.weight"])
        assert w.shape == (1, c, 1, 1) and w.dtype == np.float32
        # v0.1 ships non-negative heads (clamped at train time,
        # reference lpips/trainer.py clamp_weights)
        assert np.all(w >= 0) and np.all(np.isfinite(w))
        assert w.max() > 0  # real trained weights, not zeros


def test_real_vgg_heads_drive_lpips_fn():
    """The real vgg.pth heads flow through import_lin_heads into
    make_lpips_fn (random trunk — torchvision weights are not in the
    sandbox): d(x, x) == 0, d(x, y) > 0, finite."""
    from mhada_tpu.interop import load_pth
    from mhada_tpu.evals.lpips import (
        VGG16Features, import_lin_heads, make_lpips_fn, LPIPS_CHANNELS,
    )

    lins = import_lin_heads(load_pth(os.path.join(LPIPS_DIR, "vgg.pth")))
    assert tuple(w.shape[0] for w in lins) == LPIPS_CHANNELS

    vgg_params = VGG16Features().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )["params"]
    fn = make_lpips_fn(vgg_params, lins)

    a = jnp.asarray(load_image(list_files(CONTENTS)[0], (64, 64)))[None]
    b = jnp.asarray(load_image(list_files(STYLES)[0], (64, 64)))[None]
    d_same = float(fn(a, a)[0])
    d_diff = float(fn(a, b)[0])
    assert d_same == pytest.approx(0.0, abs=1e-6)
    assert np.isfinite(d_diff) and d_diff > 1e-5


def test_real_demo_jpegs_decode():
    """All 20 + 47 demo JPEGs decode through the host image path at the
    reference's 512^2 inference size (infer_image_all.py:42-66)."""
    cps, sps = list_files(CONTENTS), list_files(STYLES)
    assert len(cps) == 20 and len(sps) == 47
    for p in (cps[0], cps[-1], sps[0], sps[-1]):
        img = load_image(p, (512, 512))
        assert img.shape == (512, 512, 3) and img.dtype == np.float32
        assert img.min() >= 0 and img.max() <= 255
        assert img.std() > 10  # a real photograph, not a flat fill
    # decode-only sweep over the full set (no resize)
    for p in cps + sps:
        img = load_image(p)
        assert img.ndim == 3 and img.shape[-1] == 3 and img.size > 0


def test_weightfree_metrics_on_real_images(tmp_path):
    """The weight-free eval metrics (reference eval.py ssim/kl/moment/uni/
    entropy modes) produce sane values on real photographs."""
    from mhada_tpu.evals import metrics

    c0, c1 = list_files(CONTENTS)[:2]
    s0 = list_files(STYLES)[0]
    # the reference protocol compares same-sized images (stylized output vs
    # its content); the demo JPEGs vary in size, so resize for the pair case
    a = load_image(c0, (512, 512)).astype(np.uint8)
    b = load_image(c1, (512, 512)).astype(np.uint8)
    assert metrics.ssim(c0, c0) == pytest.approx(1.0, abs=1e-4)
    assert -1.0 <= metrics.ssim(a, b) < 0.999
    assert metrics.kl_divergence(c0, c0) == pytest.approx(0.0, abs=1e-9)
    assert metrics.kl_divergence(c0, s0) > 1e-4
    for p in (c0, s0):
        assert np.isfinite(metrics.nth_order_moment(p))
        u = metrics.uniformity(p)
        assert 1.0 / 256 <= u <= 1.0
        e = metrics.average_entropy(p)
        assert 0.0 < e <= 8.0  # bits, 256-bin gray histogram


def test_real_pair_stylize_smoke(tmp_path):
    """A real content/style JPEG pair runs through the full stylize path
    (tiny random-weight build, CPU) and lands back on disk as a JPEG —
    the reference infer_image flow (infer_image.py:63-94) on real pixels."""
    from mhada_tpu.infer.image import stylize_image
    from mhada_tpu.utils.image_io import save_image

    models = build_models(ModelConfig(hidden_dim=64, mlp_dim=128,
                                      num_heads=4))
    params = init_inference_params(models, jax.random.PRNGKey(0))
    c = load_image(list_files(CONTENTS)[0], (64, 64))
    s = load_image(list_files(STYLES)[0], (64, 64))
    cs = np.asarray(stylize_image(params, models, c, s))
    assert cs.shape == (64, 64, 3)
    assert np.all(np.isfinite(cs)) and cs.min() >= 0 and cs.max() <= 255
    out = str(tmp_path / "cs.jpg")
    save_image(out, cs)
    back = load_image(out)
    assert back.shape == (64, 64, 3)
