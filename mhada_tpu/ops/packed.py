"""Space-to-depth packed execution of high-resolution decoder stages.

Problem: the decoder's 512^2 stage runs 3x3 convs with only 64 channels —
the MXU is 128 wide/deep, so these convs run at <15% of peak (PERF.md).

Exact rewrite: keep the 512^2 tensor packed as (256, 256, 2, 2, C) where
(vy, vx) are the 2x2 subpixel coordinates.  A 3x3 conv on the original
domain is *exactly* a 3x3 conv on the packed domain with block-structured
weights (K = 9*4C, N = 4C — full MXU): output subpixel (dy, dx) at packed
pixel (I, J) reads original rows 2I+dy+ky-1 = 2(I+u)+vy with
u = floor((dy+ky-1)/2), vy = (dy+ky-1) mod 2.

Reflection padding (pad=1, torch edge-exclusive) in packed space mirrors
with the *subpixel retained*: top pad row [vy] = x[1-vy, :, vy], bottom pad
row [vy] = x[H-1-(1-vy), :, vy] (same rule for columns).  ReLU and bias are
per-element/per-channel, so they commute with packing.

Everything here is verified element-exact against the unpacked ops
(tests/test_packed.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def upsample2x_packed(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> packed 2x-upsample (B, H, W, 2, 2, C).

    Same math as ops.resize.upsample2x (align_corners=False, scale 2: fixed
    2-tap blends), producing subpixels as dims instead of interleaving.
    """

    def taps(x, axis):
        n = x.shape[axis]
        take = lambda a, b: lax.slice_in_dim(x, a, b, axis=axis)
        prev = jnp.concatenate([take(0, 1), take(0, n - 1)], axis=axis)
        nxt = jnp.concatenate([take(1, n), take(n - 1, n)], axis=axis)
        even = 0.25 * prev + 0.75 * x
        odd = 0.75 * x + 0.25 * nxt
        return even.astype(x.dtype), odd.astype(x.dtype)

    he, ho = taps(x, 1)               # (B, H, W, C) each
    ee, eo = taps(he, 2)
    oe, oo = taps(ho, 2)
    row_e = jnp.stack([ee, eo], axis=3)   # (B, H, W, 2, C) vx
    row_o = jnp.stack([oe, oo], axis=3)
    return jnp.stack([row_e, row_o], axis=3)  # (B, H, W, vy=2, vx=2, C)


def packed_reflect_pad(xp: jnp.ndarray) -> jnp.ndarray:
    """Pad packed (B, I, J, 2, 2, C) by one *original* pixel on each side.

    top[vy] = xp[1-vy, :, vy]; bottom[vy] = xp[H-1-(1-vy), :, vy]; same for
    columns.  Output (B, I+2, J+2, 2, 2, C).
    """

    def pad_axis(x, axis, vaxis):
        n = x.shape[axis]

        def row(i_for_v0, i_for_v1):
            r0 = lax.slice_in_dim(x, i_for_v0, i_for_v0 + 1, axis=axis)
            r1 = lax.slice_in_dim(x, i_for_v1, i_for_v1 + 1, axis=axis)
            # v0 from r0, v1 from r1
            v0 = lax.slice_in_dim(r0, 0, 1, axis=vaxis)
            v1 = lax.slice_in_dim(r1, 1, 2, axis=vaxis)
            return jnp.concatenate([v0, v1], axis=vaxis)

        top = row(1, 0)
        bottom = row(n - 1, n - 2)
        return jnp.concatenate([top, x, bottom], axis=axis)

    xp = pad_axis(xp, 1, 3)  # rows, vy
    xp = pad_axis(xp, 2, 4)  # cols, vx
    return xp


def pack_conv_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> packed (3, 3, 4*Cin, 4*Cout).

    Packed channel layout: (vy*2+vx)*C + c for inputs, (dy*2+dx)*C + c for
    outputs.  Built by scattering each original tap into the (u, v) slot it
    lands in; zeros elsewhere.
    """
    cin, cout = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for dy in range(2):
        for dx in range(2):
            for ky in range(3):
                for kx in range(3):
                    ty = dy + ky - 1
                    tx = dx + kx - 1
                    uy, vy = ty // 2, ty % 2
                    ux, vx = tx // 2, tx % 2
                    ci0 = (vy * 2 + vx) * cin
                    co0 = (dy * 2 + dx) * cout
                    out = out.at[
                        uy + 1, ux + 1, ci0:ci0 + cin, co0:co0 + cout
                    ].add(w[ky, kx])
    return out


def packed_conv_relu(
    xp: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """Reflection-padded 3x3 conv + ReLU on a packed tensor.

    xp: (B, I, J, 2, 2, C); w: (3, 3, C, Cout) original weights;
    returns packed (B, I, J, 2, 2, Cout).
    """
    bsz, ih, jw, _, _, c = xp.shape
    cout = w.shape[3]
    xpad = packed_reflect_pad(xp)
    flat = xpad.reshape(bsz, ih + 2, jw + 2, 4 * c)
    wp = pack_conv_weights(w)
    # f32 output request only for f32 inputs: with bf16 operands it breaks
    # the conv transpose rule under AD (see ops/pad_conv.py)
    preferred = jnp.float32 if flat.dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        flat, wp.astype(flat.dtype), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    ).astype(xp.dtype)
    y = y + jnp.tile(b.astype(xp.dtype), 4)
    y = jnp.maximum(y, 0)
    return y.reshape(bsz, ih, jw, 2, 2, cout)


def depth_to_space(xp: jnp.ndarray) -> jnp.ndarray:
    """Packed (B, I, J, 2, 2, C) -> (B, 2I, 2J, C)."""
    bsz, ih, jw, _, _, c = xp.shape
    x = xp.transpose(0, 1, 3, 2, 4, 5)  # (B, I, vy, J, vx, C)
    return x.reshape(bsz, 2 * ih, 2 * jw, c)
