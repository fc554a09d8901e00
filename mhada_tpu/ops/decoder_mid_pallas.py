"""Fused Pallas kernel for the decoder's three mid-resolution convs.

``mid3_fused`` runs c1 -> c2 -> c3 (reference network/conv.py:83-85: three
reflection-padded 3x3 256->256 ConvReLU stages at half resolution, 128^2
for a 512^2 frame) as ONE kernel: one HBM read of the up1 output, one
write of the c3 activation.  Through XLA these three stages cost ~0.77 ms
of the ~1.3 ms pre-tail decoder time at B=8 512^2 (~75 TF/s — implicit
im2col + per-stage HBM round trips); the fused tap-matmul form runs the
same 58 GF/frame at MXU-friendly shapes ((rows*cols, 256) @ (256, 256)
per tap, full 128-lane width and full contraction depth).

Geometry per grid step (image b, row tile t of TH output rows; row indices
below are GLOBAL rows of the named stage):

  c3 output rows  [TH.t,   TH.t + TH)
  c2 rows needed  [TH.t-1, TH.t + TH + 1)   incl. reflect rows
  c1 rows needed  [TH.t-2, TH.t + TH + 2)   incl. reflect rows
  input rows      [TH.t-3, TH.t + TH + 3)

The input is pre-padded in XLA with THREE reflect rows/cols per side, so
every window read is in-bounds.  A chain of reflect-padded convs is NOT
conv of a reflect-padded input — stage k's pad row/col -1 must be stage
k's OWN output row/col +1, not stage k applied to reflected input — so
the two garbage boundary rows/cols per edge tile are overwritten
in-kernel (jnp.where on iota, guarded by first/last-tile flags), exactly
as in the tail megakernel (decoder_tail_pallas.py).  Columns never cross
tiles (all resident), so their fixes are unconditional.

Same Mosaic constraints as the tail kernel (bisected on v5e, see its
docstring): manual-DMA HBM windows need minor dim 128 and 8-aligned
second-minor (the 256-channel input is viewed as channel-split pairs and
re-merged in VMEM); no 4D vector intermediates; f32 accumulate, rounded
to the model dtype, bias added, ReLU — the XLA chain's rounding points.

Forward-only (inference builds); training runs the plain XLA stages.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decoder_tail_pallas import _conv9
from .pad_conv import reflect_pad2d


def _stack_taps(w):
    """(3, 3, C, C) HWIO -> (9C, C): rows [tap*C, (tap+1)*C) hold tap
    (ky, ux) = divmod(tap, 3)'s (C_in, C_out) block (the _conv9 layout)."""
    k1, k2, ci, co = w.shape
    return w.reshape(k1 * k2 * ci, co)


def _row_fix(y, first, last, lo_dst, lo_src, hi_dst, hi_src):
    """y[:, lo_dst] := y[:, lo_src] on the first tile; hi on the last —
    applied on dim 0 (rows)."""
    riota = jax.lax.broadcasted_iota(jnp.int32, (y.shape[0], 1, 1), 0)
    y = jnp.where(first & (riota == lo_dst), y[lo_src:lo_src + 1], y)
    y = jnp.where(last & (riota == hi_dst), y[hi_src:hi_src + 1], y)
    return y


def _col_fix(y, lo_dst, lo_src, hi_dst, hi_src):
    """Unconditional column reflect fixes (columns are tile-resident)."""
    citer = jax.lax.broadcasted_iota(jnp.int32, (1, y.shape[1], 1), 1)
    y = jnp.where(citer == lo_dst, y[:, lo_src:lo_src + 1], y)
    y = jnp.where(citer == hi_dst, y[:, hi_src:hi_src + 1], y)
    return y


def _mid3_kernel(
    xp_hbm, w1_ref, w2_ref, w3_ref, b1_ref, b2_ref, b3_ref, o_ref,
    xbuf, sem, *, th, n_tiles, w_img, halves,
):
    dt = o_ref.dtype
    g = pl.program_id(0)
    t = g % n_tiles
    first = t == 0
    last = t == n_tiles - 1
    c = w1_ref.shape[1]

    def window_dma(slot, gg):
        return pltpu.make_async_copy(
            xp_hbm.at[gg // n_tiles,
                      pl.ds((gg % n_tiles) * th, th + 6)],
            xbuf.at[slot],
            sem.at[slot],
        )

    @pl.when(g == 0)
    def _():
        window_dma(0, 0).start()

    @pl.when(g + 1 < pl.num_programs(0))
    def _():
        window_dma((g + 1) % 2, g + 1).start()

    window_dma(g % 2, g).wait()
    xb = xbuf[g % 2]
    # channel-split minor-128 view -> (rows, W+6, C)
    x = xb.reshape(xb.shape[0], xb.shape[1] // halves,
                   halves * xb.shape[2])
    x = x[:, :w_img + 6]

    # --- c1: rows [T-2, T+th+2), cols [-2, W+2) ---
    nr1, j1 = th + 4, w_img + 4
    y1 = _conv9(x, w1_ref, j1, nr1, halves * xb.shape[2], dt)
    y1 = jnp.maximum(y1.astype(dt) + b1_ref[0], 0)
    # reflect fixes for c2's pad: c1 row/col -1 := +1 (local 1 := 3),
    # row/col W|H := W|H-2 (local nr1-2 := nr1-4)
    y1 = _row_fix(y1, first, last, 1, 3, nr1 - 2, nr1 - 4)
    y1 = _col_fix(y1, 1, 3, j1 - 2, j1 - 4)

    # --- c2: rows [T-1, T+th+1), cols [-1, W+1) ---
    nr2, j2 = th + 2, w_img + 2
    y2 = _conv9(y1, w2_ref, j2, nr2, c, dt)
    y2 = jnp.maximum(y2.astype(dt) + b2_ref[0], 0)
    y2 = _row_fix(y2, first, last, 0, 2, nr2 - 1, nr2 - 3)
    y2 = _col_fix(y2, 0, 2, j2 - 1, j2 - 3)

    # --- c3: rows [T, T+th), cols [0, W) ---
    y3 = _conv9(y2, w3_ref, w_img, th, c, dt)
    o_ref[0] = jnp.maximum(y3.astype(dt) + b3_ref[0], 0)


def mid3_fused(x, w1, b1, w2, b2, w3, b3, row_tile: int = 8):
    """Three chained reflect-padded 3x3 ConvReLU stages, fused.

    x: (B, H, W, C) NHWC; w1/w2/w3: (3, 3, C, C); b*: (C,).  C must be a
    multiple of 128.  Returns (B, H, W, C) — element-exact (modulo f32
    accumulation order) vs ``ConvReLU(c3)(ConvReLU(c2)(ConvReLU(c1)(x)))``
    (tests/test_decoder_mid.py).
    """
    b, hin, win, cin = x.shape
    assert cin % 128 == 0, cin
    th = row_tile
    # VMEM scales with th * win * itemsize; known-good point: th=8 at
    # W=128 bf16 (512^2 frames)
    row_bytes = win * jnp.dtype(x.dtype).itemsize
    if row_bytes > 256:
        th = max(2, row_tile * 256 // row_bytes)
    while hin % th:
        th -= 1
    n_tiles = hin // th
    dt = x.dtype

    xp = reflect_pad2d(x, 3)                        # (B, H+6, W+6, C)
    # minor-128 DMA view; pad the split-column count to 8-aligned
    halves = cin // 128
    jv = halves * (win + 6)
    jvp = -(-jv // 8) * 8
    xp = xp.reshape(b, hin + 6, jv, 128)
    if jvp != jv:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, jvp - jv), (0, 0)))

    w1s = _stack_taps(w1).astype(dt)
    w2s = _stack_taps(w2).astype(dt)
    w3s = _stack_taps(w3).astype(dt)
    b1v = b1.reshape(1, cin).astype(dt)
    b2v = b2.reshape(1, cin).astype(dt)
    b3v = b3.reshape(1, cin).astype(dt)

    wspec = pl.BlockSpec((9 * cin, cin), lambda g: (0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, cin), lambda g: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _mid3_kernel, th=th, n_tiles=n_tiles, w_img=win,
            halves=halves),
        grid=(b * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # xp stays in HBM
            wspec, wspec, wspec, bspec, bspec, bspec,
        ],
        out_specs=pl.BlockSpec(
            (1, th, win, cin), lambda g: (g, 0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * n_tiles, th, win, cin), dt),
        scratch_shapes=[
            pltpu.VMEM((2, th + 6, jvp, 128), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hin * win * 9 * cin * cin * 3,
            bytes_accessed=(xp.size + b * hin * win * cin)
            * jnp.dtype(dt).itemsize,
            transcendentals=0,
        ),
    )(xp, w1s, w2s, w3s, b1v, b2v, b3v)

    return out.reshape(b, n_tiles, th, win, cin).reshape(
        b, hin, win, cin)
