"""Column-packed decoder stage: element-exact vs the unpacked ops."""

import numpy as np
import jax.numpy as jnp

from mhada_tpu.ops.colpacked import (
    upsample2x_colpacked, colpacked_reflect_pad, colpacked_conv_relu,
    col_to_space, space_to_col,
)
from mhada_tpu.ops.pad_conv import conv2d_reflect, reflect_pad2d
from mhada_tpu.ops.resize import upsample2x

RNG = np.random.default_rng(3)


def _x(b=1, h=6, w=8, c=5):
    return jnp.asarray(RNG.standard_normal((b, h, w, c)), jnp.float32)


def test_upsample2x_colpacked_exact():
    x = _x()
    ref = upsample2x(x)
    got = col_to_space(upsample2x_colpacked(x))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_colpacked_reflect_pad_used_slots():
    """The pad slots the conv actually reads must equal full reflection."""
    x = _x(h=4, w=8, c=2)
    b, h, w, c = x.shape
    xp = space_to_col(x)  # (b, h, w//2, 2c), channel slot = vx*C + c
    padded = colpacked_reflect_pad(xp)
    ref = reflect_pad2d(x, 1)  # (b, h+2, w+2, c) original-domain reflection
    # used left slot: packed col 0 (pad), vx=1 == original col -1 -> ref col 0
    np.testing.assert_array_equal(
        np.asarray(padded[:, 1:-1, 0, c:]), np.asarray(ref[:, 1:-1, 0]))
    # used right slot: packed col J+1 (pad), vx=0 == original col 2J -> ref -1
    np.testing.assert_array_equal(
        np.asarray(padded[:, 1:-1, -1, :c]), np.asarray(ref[:, 1:-1, -1]))
    # row pads (any column subpixel) == original-domain row reflection
    np.testing.assert_array_equal(
        np.asarray(col_to_space(padded[:, 0:1, 1:-1])[:, 0]),
        np.asarray(ref[:, 0, 1:-1]))
    np.testing.assert_array_equal(
        np.asarray(col_to_space(padded[:, -1:, 1:-1])[:, 0]),
        np.asarray(ref[:, -1, 1:-1]))


def test_colpacked_conv_relu_exact():
    x = _x(b=2, h=6, w=10, c=4)
    w = jnp.asarray(RNG.standard_normal((3, 3, 4, 7)), jnp.float32)
    bias = jnp.asarray(RNG.standard_normal((7,)), jnp.float32)
    ref = jnp.maximum(conv2d_reflect(x, w, bias), 0)
    xp = space_to_col(x)
    got = col_to_space(colpacked_conv_relu(xp, w, bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_decoder_col_mode_exact():
    """Decoder(packed='col') == Decoder(packed=False) on shared params."""
    import jax

    from mhada_tpu.models import Decoder

    x = _x(b=1, h=4, w=6, c=512)
    plain = Decoder(packed=False)
    col = Decoder(packed="col")
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    ref = plain.apply({"params": params}, x)
    got = col.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_decoder_col_mode_gradients_match():
    """Col-packed decoder is the TPU training default: its gradients must
    match the unpacked formulation (pure-XLA ops, autodiff)."""
    import jax

    from mhada_tpu.models import Decoder

    x = _x(b=1, h=4, w=6, c=512)
    plain = Decoder(packed=False)
    col = Decoder(packed="col")
    params = plain.init(jax.random.PRNGKey(0), x)["params"]

    def loss(mod, p, x):
        return jnp.sum(jnp.sin(mod.apply({"params": p}, x) * 0.01))

    g_ref = jax.grad(lambda p: loss(plain, p, x))(params)
    g_col = jax.grad(lambda p: loss(col, p, x))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        g_col, g_ref)


def test_colpacked_conv_bf16_differentiable():
    """bf16 training regression: a hardcoded f32 preferred_element_type
    broke the conv transpose rule under AD (f32 cotangent x bf16 kernel)."""
    import jax

    x = _x(b=1, h=4, w=8, c=4).astype(jnp.bfloat16)
    w = jnp.asarray(RNG.standard_normal((3, 3, 4, 4)), jnp.bfloat16)
    b = jnp.asarray(RNG.standard_normal((4,)), jnp.bfloat16)

    def loss(w):
        return jnp.sum(
            colpacked_conv_relu(space_to_col(x), w, b).astype(jnp.float32))

    g = jax.grad(loss)(w)  # must not raise
    assert np.isfinite(np.asarray(g.astype(jnp.float32))).all()


def test_colpacked_chain_matches_unpacked_stage():
    """up3 -> c5 -> c6 chain: packed pipeline == unpacked pipeline."""
    x = _x(b=1, h=8, w=12, c=6)
    w5 = jnp.asarray(RNG.standard_normal((3, 3, 6, 6)), jnp.float32)
    b5 = jnp.asarray(RNG.standard_normal((6,)), jnp.float32)
    w6 = jnp.asarray(RNG.standard_normal((3, 3, 6, 3)), jnp.float32)
    b6 = jnp.asarray(RNG.standard_normal((3,)), jnp.float32)

    up = upsample2x(x)
    ref = jnp.maximum(conv2d_reflect(up, w5, b5), 0)
    ref = jnp.maximum(conv2d_reflect(ref, w6, b6), 0)

    xp = upsample2x_colpacked(x)
    xp = colpacked_conv_relu(xp, w5, b5)
    xp = colpacked_conv_relu(xp, w6, b6)
    got = col_to_space(xp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
