"""Fused Pallas kernels for the decoder's high-resolution tail.

Two kernels live here:

- ``tail3_fused`` (round 3): the WHOLE tail — up3 conv -> ReLU -> bilinear
  2x upsample -> c5 conv -> ReLU -> c6 conv -> ReLU — in ONE kernel.  The
  XLA col-packed tail costs ~1.6 ms/frame at B=8 (PERF.md): every stage
  round-trips a 512^2-resolution activation through HBM (~8x the pure
  bandwidth+FLOP floor).  Here the only HBM traffic is one read of the
  256^2 c4 activation and one write of the 512^2 RGB output; upsample,
  pads and both ReLUs happen in VMEM between the matmuls.
- ``c6_transposed`` (round 2): c6 only; kept as the documented fallback.

Both are element-exact-modulo-accumulation-order vs the XLA col path
(tests/test_decoder_tail.py) and forward-only (inference builds).


Transposed-stacked Pallas kernel for the decoder's last conv (c6).

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
    if j + 2 > _JW:
        raise ValueError(
            f"c6_transposed supports widths up to {2 * (_JW - 2)} px "
            f"(packed cols {j} > {_JW - 2}); use packed='mega' or 'col' "
            "for larger frames")
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


# ---------------------------------------------------------------------------
# tail3_fused: up3 + 2x bilinear upsample + c5 + c6 in one kernel
# ---------------------------------------------------------------------------
#
# Geometry per grid step (image b, row tile t of TH conv rows; all row
# indices below are GLOBAL rows of the named stage):
#
#   c6 output rows   [2TH.t,   2TH.t + 2TH)             (512-res)
#   c5 rows needed   [2TH.t-1, 2TH.t + 2TH + 1)  incl. reflect rows
#   up rows needed   [2TH.t-2, 2TH.t + 2TH + 2)  incl. reflect/clamp rows
#   up3 conv rows    [TH.t-2,  TH.t + TH + 2)           (256-res)
#   xp3 window rows  [TH.t,    TH.t + TH + 6)    (xp3 row = conv row + 3)
#
# The input is pre-padded in XLA with THREE reflect rows per side, so every
# window read is in-bounds and the two out-of-image conv rows per edge tile
# are well-defined garbage.  Rows that garbage could reach are overwritten
# in-kernel (jnp.where on a row iota, guarded by first/last-tile flags):
#
#   first tile:  up row 0's even-blend uses conv row 0 twice (global row
#                clamp), and up row -1 := up row 1 (c5's reflect pad);
#                c5 row -1 := c5 row 1 (c6's reflect pad).
#   last tile:   mirror images of the same three fixes.
#
# Column handling never needs fixes: all columns of a row tile are VMEM-
# resident, so the upsample's edge clamps and the packed reflect pads of
# c5/c6 are built directly from in-tile values, exactly mirroring
# ops/colpacked.py's constructions (same blend expressions, same bf16
# rounding points as the XLA col path: conv accumulates f32, rounds to the
# model dtype, adds the bf16 bias, ReLUs).


def _upsample_mats(c, dt):
    """Lane-permutation/blend matrices for the in-kernel column upsample
    and packed reflect pads (Mosaic rejects concats of differently-offset
    lane slices, so half-lane selects/blends are expressed as matmuls —
    ~1/9 the FLOPs of one c5 tap).

    Returns (8*2c, 2c): [A, B, C, D, Eedge, Oedge, SelLo, SelHi] where for
    packed output col j over 256-res cols c256 (ya = lanes [:c], yb = the
    rest):  even j: [0.25 yb_prev + 0.75 ya | 0.75 ya + 0.25 yb] =
    u_prev @ A + u @ B;  odd j: [0.25 ya + 0.75 yb | 0.75 yb + 0.25 ya_next]
    = u @ C + u_next @ D;  Eedge/Oedge replace A+B / C+D at the clamped
    first/last columns; SelLo/SelHi select a half (reflect pads)."""
    import numpy as np_

    e = np_.eye(c, dtype=np_.float32)
    z = np_.zeros((c, c), np_.float32)

    def blk(aa, ab, ba, bb):
        return np_.block([[aa, ab], [ba, bb]])

    A = blk(z, z, 0.25 * e, z)                 # yb(prev col) -> 0.25 dx0
    B = blk(0.75 * e, 0.75 * e, z, 0.25 * e)   # ya -> .75 dx0/.75 dx1; yb -> .25 dx1
    C = blk(0.25 * e, z, 0.75 * e, 0.75 * e)
    D = blk(z, 0.25 * e, z, z)                 # ya(next col) -> 0.25 dx1
    Eedge = blk(0.25 * e, z, z, z) + B         # col 0: c256[-1] clamps to ya0
    Oedge = C + blk(z, z, z, 0.25 * e)         # last col: clamp to yb[last]
    SelLo = blk(e, z, z, z)
    SelHi = blk(z, z, z, e)
    return jnp.asarray(
        np_.concatenate([A, B, C, D, Eedge, Oedge, SelLo, SelHi]), dt)


def _mat(wux_ref, i, c2):
    return wux_ref[i * c2:(i + 1) * c2, :]


def _dotc(u, m):
    """(rows, cols, c2) @ (c2, c2), f32 accumulate, rounded to u.dtype."""
    r, j, c2 = u.shape
    return jax.lax.dot_general(
        u.reshape(r * j, c2), m,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(r, j, c2).astype(u.dtype)


def _col_reflect(u, wux_ref):
    """In-VMEM packed-column reflect pad by 1 original column per side —
    the pcols=1 case of colpacked_reflect_pad (mixed-slot boundary cols),
    built with half-lane select matmuls."""
    j, c2 = u.shape[1], u.shape[2]
    sel_lo, sel_hi = _mat(wux_ref, 6, c2), _mat(wux_ref, 7, c2)
    left = _dotc(u[:, 1:2], sel_lo) + _dotc(u[:, 0:1], sel_hi)
    right = _dotc(u[:, j - 1:j], sel_lo) + _dotc(u[:, j - 2:j - 1], sel_hi)
    return jnp.concatenate([left, u, right], axis=1)


def _conv9(x, w_ref, j_out, nr, cin2, dt):
    """9-tap packed conv: x (nr+2, j_out+2, cin2) -> f32 (nr, j_out, cout).

    w_ref rows [tap*cin2, (tap+1)*cin2) hold tap (ky, ux)'s packed block.
    """
    acc = None
    for tap in range(9):
        ky, ux = divmod(tap, 3)
        xs = x[ky:ky + nr, ux:ux + j_out, :].reshape(nr * j_out, cin2)
        p = jax.lax.dot_general(
            xs, w_ref[tap * cin2:(tap + 1) * cin2, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = p if acc is None else acc + p
    return acc.reshape(nr, j_out, w_ref.shape[1])


def _tail3_body(
    xp_hbm, w1_ref, w5_ref, w6_ref, wux_ref, b1_ref, b5_ref,
    xbuf, sem, *, th, n_tiles, j1, j2, dt,
):
    """Shared kernel body; returns (acc, y1, c5) — the c6 planar accumulator
    plus the up3 and c5 activations (residuals for the training VJP)."""
    g = pl.program_id(0)
    t = g % n_tiles
    first = t == 0
    last = t == n_tiles - 1

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
    # the DMA'd window is a minor-128 view (Mosaic requires HBM windows
    # with minor dim 128 and 8-aligned second-minor — see tail3_fused);
    # merge sublane pairs back into 256-lane packed columns
    xb = xbuf[g % 2]
    x = xb.reshape(xb.shape[0], xb.shape[1] // 2, 2 * xb.shape[2])

    # --- up3: packed conv + ReLU (conv rows TH.t-2 .. TH.t+TH+1) ---
    nr1 = th + 4
    y1 = _conv9(x, w1_ref, j1, nr1, x.shape[-1], dt)  # (nr1, j1, 128) f32
    y1 = jnp.maximum(y1.astype(dt) + b1_ref[0], 0)

    # --- bilinear 2x, rows first (matches upsample2x_colpacked) ---
    ncr = th + 2
    E = (0.25 * y1[0:ncr] + 0.75 * y1[1:ncr + 1]).astype(dt)
    O = (0.75 * y1[1:ncr + 1] + 0.25 * y1[2:ncr + 2]).astype(dt)
    # global row clamps (XLA blends the edge row with itself)
    riota = jax.lax.broadcasted_iota(jnp.int32, (ncr, 1, 1), 0)
    eedge = (0.25 * y1[2:3] + 0.75 * y1[2:3]).astype(dt)
    E = jnp.where(first & (riota == 1), eedge, E)
    oedge = (0.75 * y1[th + 1:th + 2] + 0.25 * y1[th + 1:th + 2]).astype(dt)
    O = jnp.where(last & (riota == th), oedge, O)
    # row interleave, 3D-only (Mosaic: no 4D vectors): (R, 2j1, C) row-major
    # holds [E[r], O[r]] per r, so splitting dim 1 interleaves the rows
    u = jnp.concatenate([E, O], axis=1).reshape(
        2 * ncr, j1, y1.shape[-1])

    # columns: packed output col j covers 512-res cols {2j, 2j+1}; blends
    # expressed as lane matmuls (see _upsample_mats)
    c2 = y1.shape[-1]
    u_prev = jnp.concatenate([u[:, 0:1], u[:, :-1]], axis=1)
    u_next = jnp.concatenate([u[:, 1:], u[:, -1:]], axis=1)
    ej = _dotc(u_prev, _mat(wux_ref, 0, c2)) + _dotc(u, _mat(wux_ref, 1, c2))
    oj = _dotc(u, _mat(wux_ref, 2, c2)) + _dotc(u_next, _mat(wux_ref, 3, c2))
    citer = jax.lax.broadcasted_iota(jnp.int32, (1, j1, 1), 1)
    ej = jnp.where(citer == 0,
                   _dotc(u[:, 0:1], _mat(wux_ref, 4, c2)), ej)
    oj = jnp.where(citer == j1 - 1,
                   _dotc(u[:, j1 - 1:j1], _mat(wux_ref, 5, c2)), oj)
    # col interleave: lane-concat then split the doubled minor dim
    uc = jnp.concatenate([ej, oj], axis=-1).reshape(2 * ncr, j2, c2)

    # up-domain reflect rows for c5's pad (up row -1 := 1, 2H := 2H-2)
    uiota = jax.lax.broadcasted_iota(jnp.int32, (2 * ncr, 1, 1), 0)
    uc = jnp.where(first & (uiota == 1), uc[3:4], uc)
    uc = jnp.where(last & (uiota == 2 * th + 2), uc[2 * th:2 * th + 1], uc)
    upad = _col_reflect(uc, wux_ref)                  # (2th+4, j2+2, 128)

    # --- c5: packed conv + ReLU (rows 2TH.t-1 .. 2TH.t+2TH) ---
    nr5 = 2 * th + 2
    c5 = _conv9(upad, w5_ref, j2, nr5, upad.shape[-1], dt)
    c5 = jnp.maximum(c5.astype(dt) + b5_ref[0], 0)
    # c5-domain reflect rows for c6's pad (c5 row -1 := 1, 2H := 2H-2)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (nr5, 1, 1), 0)
    c5 = jnp.where(first & (ciota == 0), c5[2:3], c5)
    c5 = jnp.where(last & (ciota == nr5 - 1), c5[nr5 - 3:nr5 - 2], c5)
    c5p = _col_reflect(c5, wux_ref)                   # (2th+2, j2+2, 128)

    # --- c6: transposed-stacked taps (the c6_transposed geometry — the
    # only tap-extraction Mosaic compiles here: taps ride 8-aligned
    # SUBLANE slices, the spatial shift rides arbitrary LANE offsets;
    # summing 8-lane LANE slices at different offsets crashes the
    # compile helper, bisected on v5e).  Bias + ReLU run in the XLA
    # epilogue on the bf16-rounded result (same rounding points). ---
    res = jax.lax.dot_general(
        w6_ref[:], c5p.reshape(nr5 * (j2 + 2), c5p.shape[-1]),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (72, nr5*(j2+2))
    # slack so the bottom taps' shifted slices stay in-bounds (only junk
    # output positions — padded cols j2/j2+1 — ever read the slack)
    res = jnp.pad(res, ((0, 0), (0, j2 + 2)))
    nout = 2 * th * (j2 + 2)
    acc = jnp.zeros((8, nout), jnp.float32)
    for tap in range(9):
        dy, ux = divmod(tap, 3)
        off = dy * (j2 + 2) + ux
        acc = acc + jax.lax.slice(
            res, (tap * 8, off), (tap * 8 + 8, off + nout))
    return acc, y1, c5


def _tail3_kernel(
    xp_hbm, w1_ref, w5_ref, w6_ref, wux_ref, b1_ref, b5_ref, o_ref,
    xbuf, sem, *, th, n_tiles, j1, j2,
):
    acc, _, _ = _tail3_body(
        xp_hbm, w1_ref, w5_ref, w6_ref, wux_ref, b1_ref, b5_ref, xbuf, sem,
        th=th, n_tiles=n_tiles, j1=j1, j2=j2, dt=o_ref.dtype)
    o_ref[0] = acc.astype(o_ref.dtype)


def _tail3_kernel_res(
    xp_hbm, w1_ref, w5_ref, w6_ref, wux_ref, b1_ref, b5_ref,
    o_ref, y1_ref, c5_ref, xbuf, sem, *, th, n_tiles, j1, j2,
):
    """tail3 + residual outputs for the training VJP: each tile's OWNED up3
    rows (global rows [TH.t, TH.t+TH) = y1[2:2+th]) and c5 rows (global
    [2TH.t, 2TH.t+2TH) = c5[1:2th+1]) — boundary-fix rows excluded, so the
    values are exactly the XLA col path's intermediates."""
    acc, y1, c5 = _tail3_body(
        xp_hbm, w1_ref, w5_ref, w6_ref, wux_ref, b1_ref, b5_ref, xbuf, sem,
        th=th, n_tiles=n_tiles, j1=j1, j2=j2, dt=o_ref.dtype)
    o_ref[0] = acc.astype(o_ref.dtype)
    y1_ref[0] = y1[2:2 + th].reshape(th * j1, y1.shape[-1])
    c5_ref[0] = c5[1:2 * th + 1].reshape(2 * th * j2, c5.shape[-1])


def tail3_fused(x, w_up, b_up, w5, b5, w6, b6, row_tile: int = 8,
                with_residuals: bool = False):
    """The whole decoder tail, fused: ``ConvReLU(c6)(ConvReLU(c5)(
    upsample2x(relu(conv(up3)))))`` on the c4 output.

    x: (B, H, W, 128) NHWC c4 activations; w_up: (3, 3, 128, 64);
    w5: (3, 3, 64, 64); w6: (3, 3, 64, 3).  Returns (B, 2H, 2W, 3).
    H must be a multiple of ``row_tile``; W of 2.

    ``with_residuals``: also return the interior activations the training
    VJP needs — ``(rgb, y1p, c5o)`` with y1p (B, H, W/2, 128) the packed
    post-ReLU up3 conv output and c5o (B, 2H, W, 128) the packed post-ReLU
    c5 output, both exactly the XLA col path's intermediates.
    """
    from .colpacked import space_to_col

    b, hin, win, cin = x.shape
    th = row_tile
    # VMEM scales with th * win * itemsize: shrink the row tile at wider
    # frames and at f32 (th=8 @ j2=512 bf16 overflows VMEM and crashes the
    # compile helper; th=8 @ j2=256 f32 overflows the 16M scoped limit by
    # ~0.9M — caught by the f32 CLI drive).  Budget = the known-good
    # th=8 @ win=256 bf16 point; the residual outputs' double-buffered
    # blocks roughly double the per-tile footprint, so halve it.
    row_bytes = win * jnp.dtype(x.dtype).itemsize
    budget = 256 if with_residuals else 512
    if row_bytes > budget:
        th = max(2, row_tile * budget // row_bytes)
    while hin % th:
        th -= 1
    assert win % 2 == 0, (hin, win, th)
    n_tiles = hin // th
    j1, j2 = win // 2, win
    dt = x.dtype

    xc = space_to_col(x)                                  # (B, H, j1, 2cin)
    xp3 = colpacked_reflect_pad(xc, pad=3, pcols=1)       # (B, H+6, j1+2, ..)
    # minor-128 view for the kernel's manual DMA: Mosaic's compile helper
    # crashes on HBM windows whose minor dim != 128 or whose second-minor
    # isn't a multiple of 8 (bisected on v5e) — split the 256-lane packed
    # columns into sublane pairs and pad the pair count to 8-aligned
    jv = 2 * (j1 + 2)
    jvp = -(-jv // 8) * 8
    xp3 = xp3.reshape(b, hin + 6, jv, cin)
    if jvp != jv:
        xp3 = jnp.pad(xp3, ((0, 0), (0, 0), (0, jvp - jv), (0, 0)))

    w1s = colpack_conv_weights(w_up).reshape(9 * 2 * cin, 128).astype(dt)
    w5s = colpack_conv_weights(w5).reshape(9 * 128, 128).astype(dt)
    w6p = jnp.pad(colpack_conv_weights(w6), ((0, 0),) * 3 + ((0, 2),))
    w6s = w6p.transpose(0, 1, 3, 2).reshape(72, 128).astype(dt)
    wux = _upsample_mats(64, dt)                      # (8*128, 128)
    b1v = jnp.tile(b_up, 2).reshape(1, 128).astype(dt)
    b5v = jnp.tile(b5, 2).reshape(1, 128).astype(dt)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),            # xp3 stays in HBM
        pl.BlockSpec((9 * 2 * cin, 128), lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9 * 128, 128), lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((72, 128), lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8 * 128, 128), lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    o_spec = pl.BlockSpec(
        (1, 8, 2 * th * (j2 + 2)), lambda g: (g, 0, 0),
        memory_space=pltpu.VMEM)
    o_shape = jax.ShapeDtypeStruct((b * n_tiles, 8, 2 * th * (j2 + 2)), dt)
    cost = pl.CostEstimate(
        flops=2 * b * hin
        * (j1 * 9 * 2 * cin * 128          # up3 (per conv row)
           + 2 * j2 * 9 * 128 * 128        # c5 (2 rows per conv row)
           + 2 * (j2 + 2) * 128 * 72),     # c6
        bytes_accessed=xp3.size * xp3.dtype.itemsize
        + b * n_tiles * 2 * th * j2 * 8 * jnp.dtype(dt).itemsize,
        transcendentals=0,
    )
    scratch = [
        pltpu.VMEM((2, th + 6, jvp, cin), dt),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    cparams = pltpu.CompilerParams(dimension_semantics=("arbitrary",))

    if with_residuals:
        # residual index maps address (grid, row-block, lane): block row
        # size th*j1 (y1) / 2*th*j2 (c5), one block per grid step
        n = n_tiles
        outs = pl.pallas_call(
            functools.partial(
                _tail3_kernel_res, th=th, n_tiles=n_tiles, j1=j1, j2=j2),
            grid=(b * n_tiles,),
            in_specs=in_specs,
            out_specs=[
                o_spec,
                pl.BlockSpec((1, th * j1, 128),
                             lambda g, n=n: (g // n, g % n, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * th * j2, 128),
                             lambda g, n=n: (g // n, g % n, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                o_shape,
                jax.ShapeDtypeStruct((b, hin * j1, 128), dt),
                jax.ShapeDtypeStruct((b, 2 * hin * j2, 128), dt),
            ],
            scratch_shapes=scratch,
            compiler_params=cparams,
            cost_estimate=cost,
        )(xp3, w1s, w5s, w6s, wux, b1v, b5v)
        out, y1p, c5o = outs
        y1p = y1p.reshape(b, hin, j1, 128)
        c5o = c5o.reshape(b, 2 * hin, j2, 128)
    else:
        out = pl.pallas_call(
            functools.partial(
                _tail3_kernel, th=th, n_tiles=n_tiles, j1=j1, j2=j2),
            grid=(b * n_tiles,),
            in_specs=in_specs,
            out_specs=o_spec,
            out_shape=o_shape,
            scratch_shapes=scratch,
            compiler_params=cparams,
            cost_estimate=cost,
        )(xp3, w1s, w5s, w6s, wux, b1v, b5v)

    # planar (B*n_tiles, 8, 2TH*(j2+2)) -> (B, 2H, 2W, 3); bias + ReLU on
    # the bf16-rounded kernel output (the XLA col path's rounding points);
    # packed channel = dx*3 + rgb, padded cols j2/j2+1 and rows 6/7 junk
    out = out.reshape(b, n_tiles, 8, 2 * th, j2 + 2)
    out = out.transpose(0, 1, 3, 4, 2).reshape(b, 2 * hin, j2 + 2, 8)
    out = out[:, :, :j2, :6] + jnp.tile(b6, 2).astype(dt)
    out = jnp.maximum(out, 0)
    rgb = out.reshape(b, 2 * hin, j2, 2, 3).reshape(b, 2 * hin, 2 * j2, 3)
    if with_residuals:
        return rgb, y1p, c5o
    return rgb


# ---------------------------------------------------------------------------
# tail3_train: the megakernel forward made differentiable (round 5)
# ---------------------------------------------------------------------------
#
# Forward = tail3_fused emitting its interior activations (y1p, c5o) as
# extra outputs; backward = the hand-derived XLA col-path VJP evaluated at
# those saved residuals: per conv, dX rides jax.vjp of the LINEAR
# pad+pack+conv segment (linear => the primal recompute is dead code XLA
# eliminates), ReLU masks come from the saved post-ReLU activations
# (post > 0 <=> pre > 0), biases fold the two packed slots.  The only
# recompute is the bilinear upsample of y1p (bandwidth-cheap).  This swaps
# the training tail's XLA col forward (~2.6 ms/call at the 256^2 B=8 bf16
# recipe shape, scripts/decoder_bwd_probe.py) for the fused kernel while
# keeping the measured-good XLA backward.


def _conv_packed_linear(xp, w):
    """The linear part of colpacked_conv_relu: reflect-pad + packed conv
    (no bias/ReLU).  xp: (B, H, J, 2C); w: original (3, 3, C, Cout)."""
    from .colpacked import colpack_conv_weights, colpacked_reflect_pad

    wp = colpack_conv_weights(w).astype(xp.dtype)
    xpad = colpacked_reflect_pad(xp)
    preferred = jnp.float32 if xp.dtype == jnp.float32 else None
    return jax.lax.conv_general_dilated(
        xpad, wp, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    ).astype(xp.dtype)


def _fold_slot_bias_grad(dz, n, dtype):
    """Sum a packed cotangent (..., 2n) into the original (n,) bias grad."""
    s = jnp.sum(dz.reshape(-1, 2, n).astype(jnp.float32), axis=(0, 1))
    return s.astype(dtype)


@jax.custom_vjp
def tail3_train(x, w_up, b_up, w5, b5, w6, b6):
    """Differentiable fused decoder tail: megakernel forward, XLA col
    backward (gradient of the identical col-path math — parity pinned in
    tests/test_decoder_tail.py::test_tail3_train_grad_matches_col)."""
    return tail3_fused(x, w_up, b_up, w5, b5, w6, b6)


def _tail3_train_fwd(x, w_up, b_up, w5, b5, w6, b6):
    rgb, y1p, c5o = tail3_fused(
        x, w_up, b_up, w5, b5, w6, b6, with_residuals=True)
    return rgb, (x, w_up, b_up, w5, b5, w6, b6, y1p, c5o, rgb)


def _tail3_train_bwd(res, g):
    from .colpacked import (
        col_to_space, space_to_col, upsample2x_colpacked)

    x, w_up, b_up, w5, b5, w6, b6, y1p, c5o, rgb = res
    g = g.astype(rgb.dtype)

    # c6: rgb = relu(col_to_space(conv(pad(c5o), w6p)) + b6)
    dz6u = jnp.where(rgb > 0, g, 0)
    dz6 = space_to_col(dz6u)                              # (B, 2H, j2, 6)
    db6 = jnp.sum(dz6u.astype(jnp.float32), axis=(0, 1, 2)).astype(b6.dtype)
    _, pb6 = jax.vjp(_conv_packed_linear, c5o, w6)
    dc5o, dw6 = pb6(dz6)

    # c5: c5o = relu(conv(pad(up), w5p) + [b5|b5])
    dz5 = jnp.where(c5o > 0, dc5o, 0)
    db5 = _fold_slot_bias_grad(dz5, b5.shape[0], b5.dtype)
    up = upsample2x_colpacked(col_to_space(y1p))          # cheap recompute
    _, pb5 = jax.vjp(_conv_packed_linear, up, w5)
    dup, dw5 = pb5(dz5)

    # bilinear 2x upsample (linear)
    _, pbu = jax.vjp(lambda y: upsample2x_colpacked(col_to_space(y)), y1p)
    (dy1p,) = pbu(dup)

    # up3: y1p = relu(conv(pad(space_to_col(x)), w_upp) + [b_up|b_up])
    dz1 = jnp.where(y1p > 0, dy1p, 0)
    dbu = _fold_slot_bias_grad(dz1, b_up.shape[0], b_up.dtype)
    _, pb1 = jax.vjp(
        lambda xx, w: _conv_packed_linear(space_to_col(xx), w), x, w_up)
    dx, dwu = pb1(dz1)
    return dx, dwu, dbu, dw5, db5, dw6, db6


tail3_train.defvjp(_tail3_train_fwd, _tail3_train_bwd)
