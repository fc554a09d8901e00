"""Dense backward warping — torch ``grid_sample`` semantics on TPU.

The reference warps frames/features by optical flow through
``F.grid_sample(mode="bilinear", padding_mode="zeros", align_corners=False)``
(reference utilities.py:100-151).  XLA has no grid-sample op; we implement it
as a vectorised 4-tap gather in NHWC.  Out-of-bounds taps contribute zero
(each tap is masked individually, exactly torch's zero-padding rule where the
*unnormalised* coordinate decides validity per tap).
"""

import jax.numpy as jnp


def grid_sample(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear zero-padding grid sample, align_corners=False.

    x:    (B, H, W, C)
    grid: (B, Ho, Wo, 2) normalised coords in [-1, 1], last dim (x, y).
    """
    B, H, W, C = x.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    # Unnormalise (align_corners=False): px = ((g + 1) * size - 1) / 2
    px = ((gx + 1.0) * W - 1.0) * 0.5
    py = ((gy + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = px - x0
    wx0 = 1.0 - wx1
    wy1 = py - y0
    wy0 = 1.0 - wy1

    def gather(yi, xi):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = x.reshape(B, H * W, C)
        idx = yc * W + xc  # (B, Ho, Wo)
        vals = jnp.take_along_axis(
            flat, idx.reshape(B, -1, 1), axis=1
        ).reshape(idx.shape + (C,))
        return vals, valid.astype(x.dtype)

    v00, m00 = gather(y0, x0)
    v01, m01 = gather(y0, x1)
    v10, m10 = gather(y1, x0)
    v11, m11 = gather(y1, x1)

    out = (
        v00 * (wy0 * wx0 * m00)[..., None]
        + v01 * (wy0 * wx1 * m01)[..., None]
        + v10 * (wy1 * wx0 * m10)[..., None]
        + v11 * (wy1 * wx1 * m11)[..., None]
    )
    return out.astype(x.dtype)


def _base_grid(B: int, H: int, W: int, dtype) -> jnp.ndarray:
    """Pixel-index mesh grid, (B, H, W, 2) with last dim (x, y)."""
    xx = jnp.arange(W, dtype=dtype)
    yy = jnp.arange(H, dtype=dtype)
    gx, gy = jnp.meshgrid(xx, yy)  # (H, W)
    g = jnp.stack([gx, gy], axis=-1)
    return jnp.broadcast_to(g, (B, H, W, 2))


def warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``x`` by dense ``flow`` (reference utilities.py:100-118).

    x:    (B, H, W, C)
    flow: (B, H, W, 2), pixel displacements, last dim (dx, dy).
    """
    B, H, W, _ = x.shape
    vgrid = _base_grid(B, H, W, flow.dtype) + flow
    gx = 2.0 * vgrid[..., 0] / max(W - 1, 1) - 1.0
    gy = 2.0 * vgrid[..., 1] / max(H - 1, 1) - 1.0
    return grid_sample(x, jnp.stack([gx, gy], axis=-1))


def flow_warp_mask(
    flow01: jnp.ndarray, flow10: jnp.ndarray, threshold: float = 2.0
) -> jnp.ndarray:
    """Forward-backward flow-consistency validity mask.

    Reference utilities.py:121-151: warp (grid + flow01) by flow10 and mark
    pixels whose L1 round-trip error is below ``threshold``.

    flow01, flow10: (H, W, 2) pixel flows (dx, dy). Returns (H, W) float mask.
    """
    H, W, _ = flow01.shape
    grid = _base_grid(1, H, W, flow01.dtype)
    vgrid = grid + flow10[None]
    target = grid + flow01[None]  # field to be warped
    gx = 2.0 * vgrid[..., 0] / max(W - 1, 1) - 1.0
    gy = 2.0 * vgrid[..., 1] / max(H - 1, 1) - 1.0
    warped = grid_sample(target, jnp.stack([gx, gy], axis=-1))
    err = jnp.sum(jnp.abs(warped[0] - grid[0]), axis=-1)
    return (err < threshold).astype(flow01.dtype)
