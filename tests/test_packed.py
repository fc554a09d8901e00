"""Packed (space-to-depth) decoder stage must be element-exact vs unpacked."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mhada_tpu.ops.packed import (
    upsample2x_packed,
    packed_conv_relu,
    pack_conv_weights,
    depth_to_space,
)
from mhada_tpu.ops.resize import upsample2x
from mhada_tpu.ops.pad_conv import conv2d_reflect
from mhada_tpu.models.decoder import Decoder

RNG = np.random.default_rng(0)


def test_upsample_packed_matches_interleaved():
    x = jnp.asarray(RNG.standard_normal((2, 9, 13, 5)), jnp.float32)
    ref = upsample2x(x)
    got = depth_to_space(upsample2x_packed(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("hw", [(8, 8), (7, 11)])
def test_packed_conv_relu_matches_unpacked(hw):
    h, w = hw
    cin, cout = 6, 4
    x = jnp.asarray(RNG.standard_normal((1, 2 * h, 2 * w, cin)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((3, 3, cin, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(RNG.standard_normal(cout), jnp.float32)

    ref = jnp.maximum(conv2d_reflect(x, k, b), 0)

    # pack the 2H x 2W input into (H, W, 2, 2, C)
    xp = x.reshape(1, h, 2, w, 2, cin).transpose(0, 1, 3, 2, 4, 5)
    got = depth_to_space(packed_conv_relu(xp, k, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pack_conv_weights_preserves_mass():
    w = jnp.asarray(RNG.standard_normal((3, 3, 4, 5)), jnp.float32)
    wp = pack_conv_weights(w)
    assert wp.shape == (3, 3, 16, 20)
    # every original weight lands exactly once per (dy, dx)
    np.testing.assert_allclose(float(jnp.sum(wp)), 4 * float(jnp.sum(w)),
                               rtol=1e-5)


@pytest.mark.parametrize("hw", [(8, 8), (6, 10)])
def test_packed_decoder_matches_unpacked(hw):
    h, w = hw
    fcs = jnp.asarray(RNG.standard_normal((1, h, w, 512)) * 0.5, jnp.float32)
    dec = Decoder()
    dec_packed = Decoder(packed=True)
    params = dec.init(jax.random.PRNGKey(0), fcs)["params"]
    # identical param trees
    p2 = dec_packed.init(jax.random.PRNGKey(0), fcs)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    ref = dec.apply({"params": params}, fcs)
    got = dec_packed.apply({"params": params}, fcs)
    assert got.shape == ref.shape == (1, 8 * h, 8 * w, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
