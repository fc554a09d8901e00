"""Column-packed (2x1 space-to-depth) execution of the 512^2 decoder stage.

Round-1 packing (ops/packed.py) packs 2x2 subpixels: full MXU width
(4C = 256 channels) but the block-structured 3x3 kernel is 75% structural
zeros — 4x redundant FLOPs.  Packing the *width axis only* halves the
redundancy at the same utilisation sweet spot:

- packed tensor (B, H, J, 2C) with J = W/2 and channel slot vx*C + c for
  column subpixel vx in {0, 1};
- a 3x3 conv on the original domain is exactly a 3x3 conv on the packed
  domain with a (3, 3, 2C, 2C) kernel: output column phase dx at packed
  column (j) reads original columns 2j+dx+kx-1 = 2(j+ux)+vx, i.e. packed
  columns ux in {-1,0,1} — 3 taps out of the 6 (ux, vx) slots per phase,
  so the packed kernel is 50% dense: 18C^2 MACs per original pixel vs 36
  for the 2x2 packing and 9 for the unpacked conv, at 2C = 128 channels —
  exactly the MXU width.

Layout note: the packed form is strictly rank-4 (B, H, J, 2C), never
(B, H, J, 2, C).  TPU arrays are vreg-tiled (8, 128) over the last TWO
dims, so a 5D form would tile (2, C) — 4x sublane padding on every packed
tensor and op (this cost ~1.3 ms/frame in round 2 before the refactor).

Reflection padding retains the subpixel: original column -1 reflects to
+1 = packed (0, vx=1); 2J reflects to 2J-2 = packed (J-1, vx=0).  The
unused pad subpixels carry the full-reflect values (their kernel weights
are structural zeros).  Rows are unpacked, so row padding is ordinary
edge-exclusive reflection.

Element-exact vs the unpacked ops (tests/test_colpacked.py).
"""

import jax.numpy as jnp
from jax import lax


def _row_taps(x, axis):
    """even/odd 2x-upsample taps along ``axis`` (align_corners=False, the
    fixed 2-tap blends of ops.resize.upsample2x)."""
    n = x.shape[axis]
    take = lambda a, b: lax.slice_in_dim(x, a, b, axis=axis)
    prev = jnp.concatenate([take(0, 1), take(0, n - 1)], axis=axis)
    nxt = jnp.concatenate([take(1, n), take(n - 1, n)], axis=axis)
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    return even.astype(x.dtype), odd.astype(x.dtype)


def upsample2x_colpacked(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 2H, W, 2C): rows interleaved, columns packed."""
    b, h, w, c = x.shape
    re, ro = _row_taps(x, 1)
    y = jnp.stack([re, ro], axis=2).reshape(b, 2 * h, w, c)
    ce, co = _row_taps(y, 2)
    return jnp.concatenate([ce, co], axis=-1)  # channel slot = vx*C + c


def colpacked_reflect_pad(xp: jnp.ndarray, pad: int = 1,
                          pcols: int | None = None) -> jnp.ndarray:
    """Pad (B, H, J, 2C) by ``pad`` original pixels per side (pad packed
    columns, i.e. 2*pad original columns, on the column axis — every slot
    carries the full original-domain reflection value).

    Rows: ordinary reflection (row -k -> k).  Columns (derived from
    orig -i -> i, 2J-1+i -> 2J-1-i with the vx*C+c channel layout):

        left  pad col -p  = [orig 2p   | orig 2p-1 ] = [xp(p,   vx0) | xp(p-1,   vx1)]
        right pad col J-1+p = [orig 2J-2p | orig 2J-2p-1] = [xp(J-p, vx0) | xp(J-p-1, vx1)]
    """
    c = xp.shape[-1] // 2
    j = xp.shape[2]
    if pcols is None:
        # packed cols per side: col -p covers orig cols -2p..-2p+1
        pcols = -(-pad // 2)
    top = jnp.flip(xp[:, 1:pad + 1], axis=1)
    bot = jnp.flip(xp[:, -pad - 1:-1], axis=1)
    xp = jnp.concatenate([top, xp, bot], axis=1)
    lefts = [
        jnp.concatenate(
            [xp[:, :, p:p + 1, :c], xp[:, :, p - 1:p, c:]], axis=-1)
        for p in range(pcols, 0, -1)
    ]
    rights = [
        jnp.concatenate(
            [xp[:, :, j - p:j - p + 1, :c],
             xp[:, :, j - p - 1:j - p, c:]], axis=-1)
        for p in range(1, pcols + 1)
    ]
    return jnp.concatenate(lefts + [xp] + rights, axis=2)


def colpack_conv_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (3, 3, 2*Cin, 2*Cout), 50% structural zeros.

    Packed channel layout: vx*C + c (inputs), dx*C + c (outputs).
    """
    cin, cout = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 2 * cin, 2 * cout), w.dtype)
    for dx in range(2):
        for kx in range(3):
            tx = dx + kx - 1
            ux, vx = tx // 2, tx % 2
            out = out.at[
                :, ux + 1, vx * cin:(vx + 1) * cin, dx * cout:(dx + 1) * cout
            ].add(w[:, kx])
    return out


def colpacked_conv_relu(
    xp: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """Reflection-padded 3x3 conv + ReLU on a column-packed tensor.

    xp: (B, H, J, 2C); w: (3, 3, C, Cout) original weights;
    returns (B, H, J, 2*Cout).
    """
    xpad = colpacked_reflect_pad(xp)
    wp = colpack_conv_weights(w)
    # f32 output request only for f32 inputs (no-op): with bf16 operands it
    # breaks the conv transpose rule under AD (f32 cotangent x bf16 kernel
    # — see ops/pad_conv.py), and the MXU accumulates in f32 either way.
    preferred = jnp.float32 if xp.dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        xpad, wp.astype(xp.dtype), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    ).astype(xp.dtype)
    y = y + jnp.tile(b.astype(xp.dtype), 2)
    return jnp.maximum(y, 0)


def col_to_space(xp: jnp.ndarray) -> jnp.ndarray:
    """(B, H, J, 2C) -> (B, H, 2J, C)."""
    bsz, h, j, c2 = xp.shape
    return xp.reshape(bsz, h, 2 * j, c2 // 2)


def space_to_col(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W/2, 2C) column packing (free reshape).

    Lets convs with C_out < 128 run at 2*C_out output lanes: XLA's conv at
    e.g. 256^2 128->64 measures ~6.6 TF/s while the identical math packed
    (256 -> 128 channels) runs at MXU-friendly width (scripts/decoder_probe).
    """
    bsz, h, w, c = x.shape
    return x.reshape(bsz, h, w // 2, 2 * c)
