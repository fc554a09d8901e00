"""Pipelined MHAda chain (parallel/pp.py) vs the single-device path."""

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
from mhada_tpu.parallel import make_mesh
from mhada_tpu.parallel.pp import make_pp_stylize_fn

RNG = np.random.default_rng(13)


@pytest.mark.parametrize("n_stages", [2, 3, 6])
def test_pp_stylize_matches_single_device(n_stages):
    if len(jax.devices()) < n_stages:
        pytest.skip("needs virtual device mesh")
    mesh = make_mesh(n_stages, 1, devices=jax.devices()[:n_stages])
    models = build_models(ModelConfig())
    params = init_inference_params(models, jax.random.PRNGKey(0))

    m = 3  # microbatches
    contents = jnp.asarray(RNG.uniform(0, 255, (m, 1, 64, 64, 3)),
                           jnp.float32)
    style = jnp.asarray(RNG.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
    fs = make_encode_style_fn(models)(params, style)
    kv = precompute_style_kv(models, params, fs)

    single = make_stylize_with_kv_fn(models)
    ref = jnp.stack([single(params, contents[i], kv) for i in range(m)])
    got = make_pp_stylize_fn(models, mesh)(params, contents, kv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=1e-4)
