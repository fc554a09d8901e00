"""Eval CLI, flow backends, LPIPS trainer, heatmap dump smoke tests."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def image_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    a = RNG.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    b = RNG.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    pa, pb = str(d / "a.png"), str(d / "b.png")
    Image.fromarray(a).save(pa)
    Image.fromarray(b).save(pb)
    return pa, pb


@pytest.mark.parametrize("mode,expect", [
    ("ssim", "SSIM:"), ("kl", "KL:"), ("moment", "Nth Order Moment:"),
    ("uni", "Uniformity:"), ("entropy", "Average Entropy:"),
])
def test_eval_cli_modes(mode, expect, image_pair, capsys):
    from mhada_tpu.evals.cli import main

    main(["-m", mode, "-p0", image_pair[0], "-p1", image_pair[1]])
    assert expect in capsys.readouterr().out


def test_farneback_flow():
    from mhada_tpu.data.flow_models import farneback_flow_fn

    fn = farneback_flow_fn()
    img1 = RNG.uniform(0, 255, (48, 64, 3)).astype(np.float32)
    # shift content right by 3 px
    img2 = np.roll(img1, 3, axis=1)
    flow = fn(img1, img2)
    assert flow.shape == (48, 64, 2)
    # interior flow should be near +3 in x
    assert abs(float(np.median(flow[16:-16, 16:-16, 0])) - 3.0) < 1.5


def test_lpips_trainer_learns():
    from mhada_tpu.evals.lpips import VGG16Features
    from mhada_tpu.evals.lpips_trainer import make_lpips_trainer

    model = VGG16Features()
    vgg_params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)))["params"]
    init_state, train_step, distance = make_lpips_trainer(vgg_params)
    state = init_state(jax.random.PRNGKey(1))

    ref = jnp.asarray(RNG.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
    p0 = jnp.clip(ref + 80 * RNG.standard_normal(ref.shape).astype(np.float32), 0, 255)
    p1 = jnp.clip(ref + 5 * RNG.standard_normal(ref.shape).astype(np.float32), 0, 255)
    judge = jnp.ones((2,))  # humans prefer p1 (it is closer)

    losses = []
    for _ in range(5):
        state, m = train_step(state, ref, p0, p1, judge)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert all(float(w.min()) >= 0 for w in state.lin_weights)
    d = distance(state.lin_weights, ref, p1)
    assert d.shape == (2,)


def test_heatmap_dump(tmp_path):
    from mhada_tpu.config import ModelConfig
    from mhada_tpu.train.train_image import build_models
    from mhada_tpu.infer.image import (
        init_inference_params, make_diagnostic_fn, save_feature_heatmaps,
    )

    models = build_models(ModelConfig(hidden_dim=64, mlp_dim=128, num_heads=4))
    params = init_inference_params(models, jax.random.PRNGKey(0))
    fn = make_diagnostic_fn(models)
    c = jnp.asarray(RNG.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
    fc, fs, fcs, cs = fn(params, c, c)
    out = str(tmp_path / "maps")
    save_feature_heatmaps(fc, fs, fcs, out, num_heads=4)
    files = os.listdir(out)
    assert "attention_c_0.png" in files
    assert "fcs_head_4.png" in files
    assert len(files) == 6 + 12  # 3 fc + 3 fs layers, 3x4 heads
