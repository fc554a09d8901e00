"""Sequence-parallel inference (parallel/sp.py) vs the single-device path.

Runs on the conftest-provided 8 virtual CPU devices: one frame row-sharded
over all 8 must reproduce the unsharded stylization (attention K/V
all-gather, pmean'd instance-norm statistics, margin-slab decoding)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mhada_tpu.config import ModelConfig
from mhada_tpu.train.train_image import build_models
from mhada_tpu.infer.image import (
    init_inference_params,
    make_stylize_with_kv_fn,
    make_encode_style_fn,
    precompute_style_kv,
)
from mhada_tpu.parallel import make_mesh, make_sp_stylize_fn

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("n_sh", [4, 8])
def test_sp_stylize_matches_single_device(n_sh):
    if len(jax.devices()) < n_sh:
        pytest.skip("needs virtual device mesh")
    mesh = make_mesh(n_sh, 1, devices=jax.devices()[:n_sh])
    models = build_models(ModelConfig())
    params = init_inference_params(models, jax.random.PRNGKey(0))

    # H/8 = 16 token rows over n_sh shards
    content = jnp.asarray(RNG.uniform(0, 255, (1, 128, 64, 3)), jnp.float32)
    style = jnp.asarray(RNG.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
    fs = make_encode_style_fn(models)(params, style)
    kv = precompute_style_kv(models, params, fs)

    ref = make_stylize_with_kv_fn(models)(params, content, kv)
    sp_fn = make_sp_stylize_fn(models, mesh)
    got = sp_fn(params, content, kv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=1e-4)
