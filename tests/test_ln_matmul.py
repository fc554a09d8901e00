"""Fused LayerNorm+matmul kernel (ops/ln_matmul_pallas) parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mhada_tpu.models.layers import layer_norm_fn
from mhada_tpu.ops.ln_matmul_pallas import ln_matmul, ln_matmul_supported

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("b,n,e,f", [(2, 512, 128, 384), (1, 520, 256, 128)])
def test_ln_matmul_matches_unfused(b, n, e, f):
    x = jnp.asarray(RNG.standard_normal((b, n, e)), jnp.float32)
    s = jnp.asarray(RNG.standard_normal((e,)) * 0.1 + 1.0, jnp.float32)
    sb = jnp.asarray(RNG.standard_normal((e,)) * 0.1, jnp.float32)
    w = jnp.asarray(RNG.standard_normal((e, f)) / np.sqrt(e), jnp.float32)
    bias = jnp.asarray(RNG.standard_normal((f,)), jnp.float32)

    assert ln_matmul_supported(x)
    # gate floor: tiny CPU-init shapes must stay off the Pallas path
    assert not ln_matmul_supported(jnp.zeros((1, 64, 128)))
    ref = layer_norm_fn(x, s, sb) @ w + bias
    with pltpu.force_tpu_interpret_mode():
        got = ln_matmul(x, s, sb, w, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_encoder_block_fuse_ln_matches_unfused():
    """EncoderBlock(fuse_ln=True) == EncoderBlock(fuse_ln=False) with
    shared params — both pre-LN sites route through the fused kernel."""
    from mhada_tpu.models.vit import EncoderBlock

    x = jnp.asarray(RNG.standard_normal((1, 512, 128)), jnp.float32)
    plain = EncoderBlock(num_heads=2, mlp_dim=256)
    fused = EncoderBlock(num_heads=2, mlp_dim=256, fuse_ln=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    ref = plain.apply(params, x)
    with pltpu.force_tpu_interpret_mode():
        got = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_ln_matmul_vjp_matches_unfused_grads():
    """Gradients through the fused kernel's custom VJP (closed-form XLA
    backward, LN rematerialised) vs autodiff of the unfused path — all five
    inputs (x, LN scale/bias, w, b)."""
    b, n, e, f = 1, 512, 128, 256
    x = jnp.asarray(RNG.standard_normal((b, n, e)), jnp.float32)
    s = jnp.asarray(RNG.standard_normal((e,)) * 0.1 + 1.0, jnp.float32)
    sb = jnp.asarray(RNG.standard_normal((e,)) * 0.1, jnp.float32)
    w = jnp.asarray(RNG.standard_normal((e, f)) / np.sqrt(e), jnp.float32)
    bias = jnp.asarray(RNG.standard_normal((f,)) * 0.1, jnp.float32)

    def loss_ref(args):
        x, s, sb, w, bias = args
        return jnp.sum(jnp.sin(layer_norm_fn(x, s, sb) @ w + bias))

    def loss_fused(args):
        x, s, sb, w, bias = args
        return jnp.sum(jnp.sin(ln_matmul(x, s, sb, w, bias)))

    g_ref = jax.grad(loss_ref)((x, s, sb, w, bias))
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss_fused)((x, s, sb, w, bias))
    for a, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-3)


def test_encoder_block_fuse_ln_grads_match():
    """EncoderBlock(fuse_ln=True) gradients == unfused — the training-build
    A/B precondition (PERF round-4)."""
    from mhada_tpu.models.vit import EncoderBlock

    x = jnp.asarray(RNG.standard_normal((1, 512, 128)), jnp.float32)
    plain = EncoderBlock(num_heads=2, mlp_dim=256)
    fused = EncoderBlock(num_heads=2, mlp_dim=256, fuse_ln=True)
    params = plain.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p, mod):
        return jnp.sum(jnp.sin(mod.apply({"params": p}, x) * 0.1))

    g_ref = jax.grad(loss)(params, plain)
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss)(params, fused)
    flat_ref = jax.tree.leaves(g_ref)
    flat_got = jax.tree.leaves(g_got)
    for a, b_ in zip(flat_got, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=2e-3)
