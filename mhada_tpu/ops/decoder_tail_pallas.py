"""Fused Pallas kernel for the decoder's 512^2 tail: c5 -> c6 in one pass.

The final decoder stage (reference network/conv.py:92-93: two reflection-
padded 3x3 ConvReLUs, 64->64 then 64->3, at full 512^2 resolution) is the
single worst MXU fit in the model:

- c5's 64 output channels fill half the 128 MXU lanes;
- c6's 3 output channels fill 2% of them — XLA pads the output to 128
  lanes, so the tiny conv costs as much as a full-width one.

This kernel runs the whole tail column-packed (ops/colpacked.py layout:
(B, H, J, 2C), channel slot = vx*C + c) on row tiles resident in VMEM:

- c5 as 9 accumulating (rows*cols, 128) @ (128, 128) taps of the 50%-dense
  col-packed weights — full contraction depth AND full output lanes;
- c6 TRANSPOSED: dot(W6_tap^T (8, 128), c5_tile (px, 128)) — the tiny
  output dim lands on the MXU's 8-deep SUBLANE axis instead of its
  128-wide lane axis, so the pad waste is 8/6 instead of 128/6.  The
  (N, M) orientation trick makes c6 ~40x cheaper than XLA's conv;
- the c5 intermediate never exists in HBM.

All shift arithmetic happens on 2D (rows*264, 128) flattenings whose row
count is 8-divisible, so every reshape is layout-contiguous (no Mosaic
relayout copies in the hot path).

Element-exact vs the unpacked ConvReLU chain (tests/test_decoder_tail.py).
Forward-only — inference builds; training decodes through the XLA path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .colpacked import colpack_conv_weights, colpacked_reflect_pad

# Padded packed-col width: 258 valid c5 columns (packed [-1, 256]) + junk
# to the next multiple of 8 so 3D<->2D reshapes are tile-contiguous.
_JW = 264


def _tail_kernel(x_ref, w5_ref, b5_ref, w6_ref, o_ref, *, c2: int, jv: int,
                 n_tiles: int):
    """x_ref: (1, 1, TH+6, _JW, 2C) slab (2 junk slack rows at the bottom
    keep every shifted 2D slice in-bounds — the junk lands in wrap-around
    pixels no kept output reads); w5: (3, 3, 2C, 2C) col-packed; b5:
    (1, 2C); w6: (3, 3, 8, 2C) transposed col-packed (out rows padded
    6->8); o: (1, 8, TH, _JW) channel-planar c6 output (pre-bias/relu).

    c6 consumes the REFLECTION OF THE C5 OUTPUT at the image boundary
    (torch pads the produced feature map), which differs from evaluating
    c5 on reflect-padded input — so the c5 halo entries are overwritten
    with their reflected interior counterparts before the c6 taps.
    """
    f32 = jnp.float32
    c = c2 // 2
    th6 = x_ref.shape[2]
    th = th6 - 6
    x2d = x_ref[0, 0].reshape(th6 * _JW, c2)

    # ---- c5: 9 shifted full-tile taps, accumulate in f32.
    # The ux shift is applied to the INPUT (2 small relayout copies); the
    # remaining res slices are at dy*_JW — sublane-aligned (264 % 8 == 0),
    # so they are free.  Slicing res by dy*_JW+ux directly costs 18
    # misaligned relayouts of the full f32 tile (~40 MB VMEM copies/tile,
    # measured slower than the unfused XLA path).
    nc5 = (th + 3) * _JW
    nrows = th6 * _JW - 2
    acc5 = jnp.zeros((nc5, c2), f32)
    for ux in range(3):
        xs = jax.lax.slice(x2d, (ux, 0), (ux + nrows, c2))
        for dy in range(3):
            res = jax.lax.dot_general(
                xs, w5_ref[dy, ux],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            off = dy * _JW
            acc5 = acc5 + jax.lax.slice(res, (off, 0), (off + nc5, c2))
    c5k = jnp.maximum(acc5 + b5_ref[0], 0.0).reshape(th + 3, _JW, c2)

    # ---- boundary fixups: reflect-of-output halos
    # cols (every tile): orig col -1 := col 1 (packed col 0's vx1 slot);
    # orig col 2j := col 2j-2 (packed col j's vx0 slot).  Lane-dim merges
    # via masked select (Mosaic cannot concat offset lane slices).
    lane = jax.lax.broadcasted_iota(jnp.int32, (th + 3, c2), 1)
    col0 = jnp.where(lane >= c, c5k[:, 1], c5k[:, 0])
    colr = jnp.where(lane >= c, c5k[:, jv + 1], c5k[:, jv])
    c5k = jnp.concatenate(
        [col0[:, None], c5k[:, 1:jv + 1], colr[:, None], c5k[:, jv + 2:]],
        axis=1)
    # rows (boundary tiles only): orig row -1 := 1; orig row H := H-2
    t = pl.program_id(1)
    row0 = jnp.where(t == 0, c5k[2], c5k[0])
    rowl = jnp.where(t == n_tiles - 1, c5k[th - 1], c5k[th + 1])
    c5k = jnp.concatenate(
        [row0[None], c5k[1:th + 1], rowl[None], c5k[th + 2:]], axis=0)
    c5b = c5k.reshape(nc5, c2).astype(x2d.dtype)

    # ---- c6 transposed: dot(W^T (8, 2C), c5 (px, 2C)) -> (8, px).
    # Shifts applied to c5 rows pre-dot (ux on the input, dy*_JW aligned),
    # so each tap lands exactly on the accumulator — no lane slicing.
    nc6 = th * _JW
    acc6 = jnp.zeros((8, nc6), f32)
    for ux in range(3):
        c5s = jax.lax.slice(c5b, (ux, 0), (ux + nc5 - 2, c2))
        for dy in range(3):
            c5sd = jax.lax.slice(
                c5s, (dy * _JW, 0), (dy * _JW + nc6, c2))
            acc6 = acc6 + jax.lax.dot_general(
                w6_ref[dy, ux].astype(x2d.dtype), c5sd,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
    # keep 2D: Mosaic cannot shape-cast the lane dim; XLA unflattens
    o_ref[0, 0] = acc6.astype(o_ref.dtype)


def decoder_tail_fused(up_cp, w5, b5, w6, b6):
    """Fused c5+c6 on the col-packed upsampled tensor.

    up_cp: (B, H, J, 2C) col-packed 512^2-stage input (output of
    ``upsample2x_colpacked``), C=w5 input channels; w5: (3, 3, C, C);
    w6: (3, 3, C, 3).  Returns (B, H, 2J, 3) NHWC after both ReLUs —
    exactly ``ConvReLU(c6)(ConvReLU(c5)(col_to_space(up_cp)))``.
    """
    b, h, j, c2 = up_cp.shape
    # f32 doubles every VMEM buffer: halve the row tile
    _TH = 8 if up_cp.dtype.itemsize > 2 else 16
    assert h % _TH == 0 and c2 == 128, (h, c2)
    n_tiles = h // _TH
    dt = up_cp.dtype

    # rows: pad 2 original pixels; packed cols: pad 2 PACKED cols per side
    # (the outermost one feeds only the chain's discarded halo phase — the
    # col-packed weight structure never weights its slots for kept
    # outputs); then junk-pad the col axis to _JW so in-kernel reshapes
    # are tile-contiguous
    xp = colpacked_reflect_pad(up_cp, pad=2, pcols=2)  # (B, h+4, j+4, 2C)
    xp = jnp.pad(
        xp, ((0, 0), (0, 2), (0, _JW - (j + 4)), (0, 0)))  # slack rows/cols
    # overlapping row slabs: tile t needs padded rows [t*TH, t*TH + TH+6)
    slabs = jnp.stack(
        [xp[:, t * _TH: t * _TH + _TH + 6] for t in range(n_tiles)], axis=1
    )  # (B, n_tiles, TH+6, _JW, 2C)

    w5p = colpack_conv_weights(w5).astype(dt)          # (3, 3, 2C, 2C)
    b5p = jnp.tile(b5, 2).astype(jnp.float32)[None]    # (1, 2C)
    w6p = colpack_conv_weights(w6)                     # (3, 3, 2C, 6)
    w6t = jnp.pad(w6p.transpose(0, 1, 3, 2), ((0, 0), (0, 0), (0, 2), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_tail_kernel, c2=c2, jv=j, n_tiles=n_tiles),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, _TH + 6, _JW, c2),
                         lambda i, t: (i, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c2, c2), lambda i, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 8, c2), lambda i, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, _TH * _JW),
                               lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, 8, _TH * _JW),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * _JW * 9 * c2 * (c2 + 8),
            bytes_accessed=2 * b * h * _JW * c2 + 4 * b * 8 * h * _JW,
            transcendentals=0,
        ),
    )(slabs, w5p, b5p, w6t.astype(dt))

    # (B, n_tiles, 8, TH*_JW) -> channel-planar (B, 8, H, _JW) -> NHWC
    # (B, H, 2J, 3): channel = dx*3 + rgb, junk cols >= j sliced off
    out = out.transpose(0, 2, 1, 3).reshape(b, 8, h, _JW)
    y = out[:, :6, :, :j]                       # (B, 6, H, J)
    y = y.reshape(b, 2, 3, h, j).transpose(0, 3, 4, 1, 2)  # (B, H, J, 2, 3)
    y = y.reshape(b, h, 2 * j, 3)
    y = jnp.maximum(y + b6.astype(jnp.float32), 0.0)
    return y.astype(dt)
