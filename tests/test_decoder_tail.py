"""Transposed-stacked Pallas c6 kernel vs the unpacked ConvReLU chain."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mhada_tpu.ops.colpacked import space_to_col
from mhada_tpu.ops.decoder_tail_pallas import c6_transposed
from mhada_tpu.ops.pad_conv import conv2d_reflect

RNG = np.random.default_rng(7)


def test_c6_transposed_exact():
    for b, h, w in ((1, 32, 24), (2, 48, 16)):
        y = jnp.asarray(np.abs(RNG.standard_normal((b, h, w, 64))),
                        jnp.float32)
        w6 = jnp.asarray(RNG.standard_normal((3, 3, 64, 3)) * 0.1,
                         jnp.float32)
        b6 = jnp.asarray(RNG.standard_normal((3,)), jnp.float32)
        ref = jnp.maximum(conv2d_reflect(y, w6, b6), 0)
        with pltpu.force_tpu_interpret_mode():
            got = c6_transposed(space_to_col(y), w6, b6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)


def test_decoder_tail_mode_matches_plain():
    """Decoder(packed='col_tail') == Decoder(packed=False), shared params."""
    from mhada_tpu.models import Decoder

    x = jnp.asarray(RNG.standard_normal((1, 4, 6, 512)), jnp.float32)
    plain = Decoder(packed=False)
    fused = Decoder(packed="col_tail")
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    ref = plain.apply({"params": params}, x)
    with pltpu.force_tpu_interpret_mode():
        got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
