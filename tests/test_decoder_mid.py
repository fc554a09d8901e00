"""mid3_fused (fused c1->c2->c3 decoder mid stages) vs the plain XLA chain.

Covers multi-tile row windows (first/last-tile reflect fixes), the
single-tile case (first==last), both channel widths (128 / 256) and both
dtypes, in Pallas interpret mode (tests run on CPU).
"""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mhada_tpu.ops.decoder_mid_pallas import mid3_fused
from mhada_tpu.ops.pad_conv import reflect_pad2d, conv2d_reflect

RNG = np.random.default_rng(7)


def _ref_chain(x, ws, bs):
    for w, b in zip(ws, bs):
        x = jnp.maximum(conv2d_reflect(x, w, b), 0)
    return x


def _mk(c):
    ws = [jnp.asarray(RNG.standard_normal((3, 3, c, c)) * (0.5 / np.sqrt(c)),
                      jnp.float32) for _ in range(3)]
    bs = [jnp.asarray(RNG.standard_normal((c,)) * 0.1, jnp.float32)
          for _ in range(3)]
    return ws, bs


def test_mid3_fused_exact_f32():
    for c, b, h, w, th in (
        (128, 1, 8, 8, 8),     # single tile: first == last
        (128, 1, 16, 8, 8),    # two tiles
        (256, 2, 12, 8, 4),    # three tiles, full channel width
    ):
        ws, bs = _mk(c)
        x = jnp.asarray(RNG.standard_normal((b, h, w, c)), jnp.float32)
        ref = _ref_chain(x, ws, bs)
        with pltpu.force_tpu_interpret_mode():
            got = mid3_fused(x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
                             row_tile=th)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4)


def test_mid3_fused_bf16_matches_xla_rounding():
    c = 128
    ws, bs = _mk(c)
    x = jnp.asarray(RNG.standard_normal((1, 16, 8, c)), jnp.bfloat16)
    ref = _ref_chain(x, [w.astype(jnp.bfloat16) for w in ws],
                     [b.astype(jnp.bfloat16) for b in bs])
    with pltpu.force_tpu_interpret_mode():
        got = mid3_fused(x, *[t for pair in zip(
            [w.astype(jnp.bfloat16) for w in ws],
            [b.astype(jnp.bfloat16) for b in bs]) for t in pair],
            row_tile=8)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.12, rtol=0.05)
