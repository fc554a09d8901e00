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
    mega = Decoder(packed="mega", mega_min_grid=0)  # force the kernel
    params = col.init(jax.random.PRNGKey(1),
                      fcs.astype(jnp.float32))["params"]
    ref = col.apply({"params": params}, fcs)
    with pltpu.force_tpu_interpret_mode():
        got = mega.apply({"params": params}, fcs)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.02)


def _tail_params():
    wu = jnp.asarray(RNG.standard_normal((3, 3, 128, 64)) * 0.1, jnp.float32)
    bu = jnp.asarray(RNG.standard_normal((64,)) * 0.1, jnp.float32)
    w5 = jnp.asarray(RNG.standard_normal((3, 3, 64, 64)) * 0.1, jnp.float32)
    b5 = jnp.asarray(RNG.standard_normal((64,)) * 0.1, jnp.float32)
    w6 = jnp.asarray(RNG.standard_normal((3, 3, 64, 3)) * 0.1, jnp.float32)
    b6 = jnp.asarray(RNG.standard_normal((3,)) * 0.1, jnp.float32)
    return wu, bu, w5, b5, w6, b6


def _tail_col(x, wu, bu, w5, b5, w6, b6):
    """The XLA col-packed tail (what training used through round 4)."""
    from mhada_tpu.ops.colpacked import (
        col_to_space, colpacked_conv_relu, space_to_col,
        upsample2x_colpacked)

    y1p = colpacked_conv_relu(space_to_col(x), wu, bu)
    up = upsample2x_colpacked(col_to_space(y1p))
    c5o = colpacked_conv_relu(up, w5, b5)
    return col_to_space(colpacked_conv_relu(c5o, w6, b6)), y1p, c5o


def test_tail3_fused_residuals_match_col_intermediates():
    """with_residuals=True must emit exactly the XLA col path's interior
    activations (y1p, c5o) — the training VJP's linearisation points."""
    from mhada_tpu.ops.decoder_tail_pallas import tail3_fused

    wu, bu, w5, b5, w6, b6 = _tail_params()
    for b, h, w in ((1, 16, 8), (2, 8, 12)):
        x = jnp.asarray(RNG.standard_normal((b, h, w, 128)), jnp.float32)
        ref_rgb, ref_y1p, ref_c5o = _tail_col(x, wu, bu, w5, b5, w6, b6)
        with pltpu.force_tpu_interpret_mode():
            rgb, y1p, c5o = tail3_fused(
                x, wu, bu, w5, b5, w6, b6, with_residuals=True)
        assert y1p.shape == ref_y1p.shape and c5o.shape == ref_c5o.shape
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref_rgb),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(y1p), np.asarray(ref_y1p),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(c5o), np.asarray(ref_c5o),
                                   atol=2e-4, rtol=1e-4)


def test_tail3_train_grad_matches_col():
    """The differentiable megakernel's gradients (all 7 inputs) must match
    jax.grad of the XLA col tail (VERDICT r4 #1)."""
    from mhada_tpu.ops.decoder_tail_pallas import tail3_train

    wu, bu, w5, b5, w6, b6 = _tail_params()
    x = jnp.asarray(RNG.standard_normal((2, 16, 8, 128)), jnp.float32)
    args = (x, wu, bu, w5, b5, w6, b6)

    # weighted sum -> nontrivial cotangent
    b_, h, w = x.shape[0], 2 * x.shape[1], 2 * x.shape[2]
    cot = jnp.asarray(RNG.standard_normal((b_, h, w, 3)), jnp.float32)

    def loss_col(*a):
        return jnp.sum(_tail_col(*a)[0] * cot)

    def loss_train(*a):
        return jnp.sum(tail3_train(*a) * cot)

    ref = jax.grad(loss_col, argnums=tuple(range(7)))(*args)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_train, argnums=tuple(range(7)))(*args)
    names = ("dx", "dwu", "dbu", "dw5", "db5", "dw6", "db6")
    for name, a, b in zip(names, ref, got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4,
            err_msg=name)


def test_decoder_mega_train_mode():
    """Decoder(packed='mega_train') == col forward; grads flow end-to-end
    through Decoder.apply (the training wiring)."""
    from mhada_tpu.models import Decoder

    fcs = jnp.asarray(RNG.standard_normal((1, 4, 6, 512)), jnp.float32)
    col = Decoder(packed="col")
    mt = Decoder(packed="mega_train")
    params = col.init(jax.random.PRNGKey(2), fcs)["params"]
    ref = col.apply({"params": params}, fcs)
    with pltpu.force_tpu_interpret_mode():
        got = mt.apply({"params": params}, fcs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)

    def loss(fn, p, x):
        return jnp.sum(jnp.square(fn.apply({"params": p}, x)))

    gref = jax.grad(lambda p: loss(col, p, fcs))(params)
    with pltpu.force_tpu_interpret_mode():
        ggot = jax.grad(lambda p: loss(mt, p, fcs))(params)
    ref_leaves = jax.tree_util.tree_leaves_with_path(gref)
    got_leaves = jax.tree_util.tree_leaves_with_path(ggot)
    for (pa, a), (pb, b) in zip(ref_leaves, got_leaves):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-3, rtol=1e-3,
            err_msg=jax.tree_util.keystr(pa))


def test_mega_small_grid_fallback_routes_to_col():
    """Decoder(packed='mega') at a small grid (B*H/th < mega_min_grid) must
    take the XLA col path BITWISE (no Pallas kernel traced), while
    mega_min_grid=0 forces the kernel (models/decoder.py round-5)."""
    from mhada_tpu.models import Decoder

    fcs = jnp.asarray(RNG.standard_normal((1, 4, 6, 512)), jnp.float32)
    col = Decoder(packed="col")
    mega_fb = Decoder(packed="mega")  # grid = 1 * 16/8 = 2 < 64 -> col
    params = col.init(jax.random.PRNGKey(3), fcs)["params"]
    ref = col.apply({"params": params}, fcs)
    got = mega_fb.apply({"params": params}, fcs)  # no interpret ctx needed
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # and the fallback never triggers for a big-batch trace: the forced
    # kernel path must still be reachable (covered in interpret mode above)
    lowered = jax.jit(lambda p, x: mega_fb.apply({"params": p}, x)).lower(
        params, fcs)
    assert "pallas" not in lowered.as_text().lower()
