"""Pipelined stylization chain (parallel/pp.py) vs the single-device path,
plus the structural gate that encode/decode are NOT replicated per stage."""

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


def _sub_jaxprs(obj):
    """Recursively find jaxprs nested in an eqn's params value."""
    if hasattr(obj, "jaxpr"):  # ClosedJaxpr
        yield obj.jaxpr
    elif hasattr(obj, "eqns"):  # Jaxpr
        yield obj
    elif isinstance(obj, (list, tuple)):
        for o in obj:
            yield from _sub_jaxprs(o)
    elif isinstance(obj, dict):
        for o in obj.values():
            yield from _sub_jaxprs(o)


def _walk_convs(jaxpr, in_cond=False):
    """Yield one bool per conv_general_dilated eqn: was it inside a cond?"""
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            yield in_cond
        inner = in_cond or name == "cond"
        for v in eqn.params.values():
            for sub in _sub_jaxprs(v):
                yield from _walk_convs(sub, inner)


def test_pp_encode_decode_not_replicated():
    """Structural gate (VERDICT r2): the pipelined program must run the ViT
    encode (patch-embed conv) and the decoder (9 convs) ONLY inside
    ``lax.cond`` branches gated on the stage index — never unconditionally
    on every stage.  The MHAda stage compute itself is conv-free, so
    'no convolution outside a cond branch' is exactly that property."""
    n_stages = 2
    if len(jax.devices()) < n_stages:
        pytest.skip("needs virtual device mesh")
    mesh = make_mesh(n_stages, 1, devices=jax.devices()[:n_stages])
    models = build_models(ModelConfig())
    params = init_inference_params(models, jax.random.PRNGKey(0))

    contents = jnp.zeros((3, 1, 64, 64, 3), jnp.float32)
    style = jnp.zeros((1, 64, 64, 3), jnp.float32)
    fs = make_encode_style_fn(models)(params, style)
    kv = precompute_style_kv(models, params, fs)

    fn = make_pp_stylize_fn(models, mesh)
    jaxpr = jax.make_jaxpr(fn)(params, contents, kv).jaxpr
    flags = list(_walk_convs(jaxpr))
    assert len(flags) >= 10, f"expected encoder+decoder convs, saw {len(flags)}"
    assert all(flags), (
        f"{sum(not f for f in flags)}/{len(flags)} convolutions run "
        "unconditionally on every pipeline stage (replicated encode/decode)"
    )
