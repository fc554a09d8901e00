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


def _tail_ref(x, wu, bu, w5, b5, w6, b6):
    """The unpacked XLA chain the megakernel replaces."""
    from mhada_tpu.ops.resize import upsample2x

    y = jnp.maximum(conv2d_reflect(x, wu, bu), 0)
    y = upsample2x(y)
    y = jnp.maximum(conv2d_reflect(y, w5, b5), 0)
    return jnp.maximum(conv2d_reflect(y, w6, b6), 0)


def test_tail3_fused_exact():
    """tail3_fused == up3 -> 2x -> c5 -> c6, incl. first/last-tile edge
    fixes (n_tiles 1, 2 and 4) and both dtypes."""
    from mhada_tpu.ops.decoder_tail_pallas import tail3_fused

    wu = jnp.asarray(RNG.standard_normal((3, 3, 128, 64)) * 0.1, jnp.float32)
    bu = jnp.asarray(RNG.standard_normal((64,)) * 0.1, jnp.float32)
    w5 = jnp.asarray(RNG.standard_normal((3, 3, 64, 64)) * 0.1, jnp.float32)
    b5 = jnp.asarray(RNG.standard_normal((64,)) * 0.1, jnp.float32)
    w6 = jnp.asarray(RNG.standard_normal((3, 3, 64, 3)) * 0.1, jnp.float32)
    b6 = jnp.asarray(RNG.standard_normal((3,)) * 0.1, jnp.float32)
    for b, h, w, th in ((1, 8, 12, 8), (1, 16, 8, 8), (2, 32, 16, 8)):
        x = jnp.asarray(RNG.standard_normal((b, h, w, 128)), jnp.float32)
        ref = _tail_ref(x, wu, bu, w5, b5, w6, b6)
        with pltpu.force_tpu_interpret_mode():
            got = tail3_fused(x, wu, bu, w5, b5, w6, b6, row_tile=th)
        assert got.shape == (b, 2 * h, 2 * w, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)

    # f32 at a wide row (row_bytes = 256*4 > 512) engages the VMEM
    # row-tile auto-shrink (th 8 -> 4, two tiles) — the f32 512^2 CLI
    # path that overflowed scoped VMEM before the byte-budget rule
    x = jnp.asarray(RNG.standard_normal((1, 8, 256, 128)), jnp.float32)
    ref = _tail_ref(x, wu, bu, w5, b5, w6, b6)
    with pltpu.force_tpu_interpret_mode():
        got = tail3_fused(x, wu, bu, w5, b5, w6, b6, row_tile=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)

    # bf16: must match the XLA col-packed path's rounding points
    from mhada_tpu.models import Decoder

    fcs = jnp.asarray(RNG.standard_normal((1, 4, 4, 512)), jnp.bfloat16)
    col = Decoder(packed="col")
    mega = Decoder(packed="mega")
    params = col.init(jax.random.PRNGKey(1),
                      fcs.astype(jnp.float32))["params"]
    ref = col.apply({"params": params}, fcs)
    with pltpu.force_tpu_interpret_mode():
        got = mega.apply({"params": params}, fcs)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.02)
