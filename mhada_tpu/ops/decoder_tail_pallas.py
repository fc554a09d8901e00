"""Transposed-stacked Pallas kernel for the decoder's last conv (c6).

The final decoder conv (reference network/conv.py:93: reflection-padded
3x3, 64 -> 3 channels, at full 512^2 resolution) is the single worst MXU
fit in the model: XLA pads the 3 output channels to 128 lanes, so the tiny
conv costs as much as a full-width one (~0.34 ms/frame at ~5 TF/s on the
col-packed path).

This kernel flips and stacks the geometry:

- **transposed orientation**: instead of (pixels, Cin) @ (Cin, Cout) with
  Cout=6 wasted lanes, compute (Cout, Cin) @ (Cin, pixels) — the tiny
  output dim rides the MXU's sublane axis, the huge pixel count rides the
  128-lane axis;
- **stacked taps**: all 9 kernel taps' (8, 128) transposed weight blocks
  stack into ONE (72, 128) lhs, so the whole conv is a single
  (72, 128) @ (128, rows) matmul per row tile — no per-tap matmul drain.
  The 9 (8, pixels) result stripes are then shift-added on the VPU (the
  tap's (dy, ux) offset becomes a lane shift of dy*_JW + ux on the
  flattened (row*_JW + col) pixel axis);
- **manual-DMA input windows**: the padded c5 output stays in HBM
  (pl.ANY); each grid step async-copies its overlapping (TH+3)-row window
  into a double-buffered VMEM scratch slot, prefetching the next window
  while computing the current one;
- **no in-kernel boundary logic**: c6 consumes the reflection of the c5
  OUTPUT (torch pads the produced feature map), which XLA pre-computes
  with ``colpacked_reflect_pad`` — the kernel sees a fully padded input.

Input is col-packed ((B, H, J, 2C) layout, ops/colpacked.py); output is
channel-planar (8, pixels) per tile, unpacked to NHWC by an XLA epilogue.

Element-exact vs the unpacked ConvReLU (tests/test_decoder_tail.py).
Forward-only — inference builds; training decodes through the XLA path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .colpacked import colpack_conv_weights, colpacked_reflect_pad

# Padded packed-col width: 258 valid cols (packed [-1, 256]) + junk to the
# next multiple of 8 so 3D<->2D reshapes are tile-contiguous.
_JW = 264


def _c6_kernel(x_hbm, w_ref, o_ref, xbuf, sem, *, th: int, n_tiles: int):
    """Grid: 1D over b*n_tiles (sequential — the double buffer carries DMA
    state across steps).  x_hbm: (B, H+3, _JW, 2C) padded c5 output in
    HBM (1 reflect row per side + 1 junk slack row at the bottom; junk
    cols zero); xbuf: (2, TH+3, _JW, 2C) VMEM scratch; w: (72, 2C)
    stacked transposed col-packed weights (9 taps x 8 padded out-rows);
    o: (1, 1, 8, TH*_JW) channel-planar output (pre-bias/relu).
    """
    f32 = jnp.float32
    g = pl.program_id(0)

    def window_dma(slot, gg):
        return pltpu.make_async_copy(
            x_hbm.at[gg // n_tiles, pl.ds((gg % n_tiles) * th, th + 3)],
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
    c2 = x_hbm.shape[-1]
    x2d = xbuf[g % 2].reshape((th + 3) * _JW, c2)

    # one full-width matmul: (72, 2C) @ (2C, (TH+3)*_JW)
    res = jax.lax.dot_general(
        w_ref[:], x2d,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )  # (72, (TH+3)*_JW)

    # tap (dy, ux)'s stripe, lane-shifted by its flattened pixel offset:
    # out(r, m) = sum_taps w[dy, ux] . xpad(r + dy, m + ux)
    nc6 = th * _JW
    acc = jnp.zeros((8, nc6), f32)
    for tap in range(9):
        dy, ux = divmod(tap, 3)
        off = dy * _JW + ux
        acc = acc + jax.lax.slice(
            res, (tap * 8, off), (tap * 8 + 8, off + nc6))
    o_ref[0, 0] = acc


def c6_transposed(y_cp, w6, b6, row_tile: int | None = None):
    """The decoder's final conv on the col-packed c5 output.

    y_cp: (B, H, J, 2C) col-packed c5 activations (C = 64); w6:
    (3, 3, C, 3) original conv weights; b6: (3,).  Returns (B, H, 2J, 3)
    NHWC after bias + ReLU — exactly ``ConvReLU(c6)(col_to_space(y_cp))``.
    """
    b, h, j, c2 = y_cp.shape
    _TH = row_tile or next(t for t in (32, 16, 8, 4, 2, 1) if h % t == 0)
    assert h % _TH == 0 and c2 == 128, (h, c2)
    n_tiles = h // _TH
    dt = y_cp.dtype

    # reflect-of-output padding in XLA (cheap: one extra row/col each
    # side), junk-pad cols to _JW and add 1 slack row so every lane-shifted
    # slice in the kernel stays in-bounds (wrap-around reads land in junk
    # no kept output uses)
    xp = colpacked_reflect_pad(y_cp, pad=1, pcols=1)  # (B, h+2, j+2, 2C)
    xp = jnp.pad(xp, ((0, 0), (0, 1), (0, _JW - (j + 2)), (0, 0)))

    w6p = colpack_conv_weights(w6)                     # (3, 3, 2C, 6)
    w6t = jnp.pad(w6p.transpose(0, 1, 3, 2),
                  ((0, 0), (0, 0), (0, 2), (0, 0)))    # (3, 3, 8, 2C)
    w_stacked = w6t.reshape(72, c2).astype(dt)

    out = pl.pallas_call(
        functools.partial(_c6_kernel, th=_TH, n_tiles=n_tiles),
        grid=(b * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM, DMA'd
            pl.BlockSpec((72, c2), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8, _TH * _JW),
            lambda g, n=n_tiles: (g // n, g % n, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, 8, _TH * _JW),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, _TH + 3, _JW, c2), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # sequential grid: the double buffer carries DMA state
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * _JW * 72 * c2,
            bytes_accessed=2 * b * h * _JW * c2 + 4 * b * 8 * h * _JW,
            transcendentals=0,
        ),
    )(xp, w_stacked)

    # (B, n_tiles, 8, TH*_JW) -> channel-planar (B, 8, H, _JW) -> NHWC
    # (B, H, 2J, 3): channel = dx*3 + rgb, junk cols >= j sliced off
    out = out.transpose(0, 2, 1, 3).reshape(b, 8, h, _JW)
    y = out[:, :6, :, :j]                       # (B, 6, H, J)
    y = y.reshape(b, 2, 3, h, j).transpose(0, 3, 4, 1, 2)  # (B, H, J, 2, 3)
    y = y.reshape(b, h, 2 * j, 3)
    y = jnp.maximum(y + b6.astype(jnp.float32), 0.0)
    return y.astype(dt)
