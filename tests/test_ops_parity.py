"""Golden parity of the op layer against PyTorch CPU semantics.

These ops are the numerical foundation of LPIPS<=1e-3 end-to-end parity
(SURVEY.md §7 hard part 1): bilinear resize (align_corners=False), reflection
pad + conv, instance norm, grid_sample warp, and the MHAda attention math.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from mhada_tpu import ops  # noqa: E402

RNG = np.random.default_rng(0)


def t2j_nchw(x):
    """torch NCHW tensor -> jax NHWC array."""
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def j2n_nhwc(x):
    """jax NHWC -> numpy NCHW."""
    return np.asarray(x).transpose(0, 3, 1, 2)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((32, 32), (64, 64)), ((64, 48), (32, 24)), ((32, 32), (17, 23)),
     ((7, 9), (20, 30)), ((64, 64), (64, 64))],
)
def test_resize_bilinear_matches_torch(in_hw, out_hw):
    x = RNG.standard_normal((2, 5, *in_hw), dtype=np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=False
    ).numpy()
    got = j2n_nhwc(ops.resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_upsample2x_matches_torch_scale_factor():
    x = RNG.standard_normal((1, 4, 13, 17), dtype=np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), scale_factor=2, mode="bilinear", align_corners=False
    ).numpy()
    got = j2n_nhwc(ops.upsample2x(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)


def test_instance_norm_matches_torch():
    x = RNG.standard_normal((3, 16, 10, 12), dtype=np.float32) * 5 + 2
    ref = torch.nn.InstanceNorm2d(16, affine=False)(torch.from_numpy(x)).numpy()
    got = j2n_nhwc(ops.instance_norm(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_reflect_conv_matches_torch():
    x = RNG.standard_normal((2, 8, 14, 14), dtype=np.float32)
    w = RNG.standard_normal((6, 8, 3, 3), dtype=np.float32) * 0.1
    b = RNG.standard_normal(6, dtype=np.float32)
    xt = torch.from_numpy(x)
    ref = F.conv2d(F.pad(xt, (1, 1, 1, 1), mode="reflect"),
                   torch.from_numpy(w), torch.from_numpy(b)).numpy()
    got = j2n_nhwc(
        ops.conv2d_reflect(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(w.transpose(2, 3, 1, 0)),
            jnp.asarray(b),
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_strided_conv_matches_torch():
    # Patch embedding style: kernel = stride = 8.
    x = RNG.standard_normal((2, 3, 64, 64), dtype=np.float32)
    w = RNG.standard_normal((32, 3, 8, 8), dtype=np.float32) * 0.1
    b = RNG.standard_normal(32, dtype=np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                   torch.from_numpy(b), stride=8).numpy()
    got = j2n_nhwc(
        ops.conv2d(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(w.transpose(2, 3, 1, 0)),
            jnp.asarray(b),
            stride=8,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)


def test_max_pool_matches_torch():
    x = RNG.standard_normal((2, 4, 15, 15), dtype=np.float32)
    ref = F.max_pool2d(torch.from_numpy(x), 2, 2).numpy()
    got = j2n_nhwc(ops.max_pool2d(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, atol=0, rtol=0)


def test_grid_sample_matches_torch():
    x = RNG.standard_normal((2, 3, 20, 24), dtype=np.float32)
    grid = (RNG.standard_normal((2, 10, 12, 2)) * 0.8).astype(np.float32)
    ref = F.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).numpy()
    got = j2n_nhwc(
        ops.grid_sample(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(grid))
    )
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_grid_sample_out_of_bounds_zero_padding():
    x = np.ones((1, 1, 8, 8), dtype=np.float32)
    grid = np.full((1, 4, 4, 2), 1.5, dtype=np.float32)  # far out of range
    ref = F.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).numpy()
    got = j2n_nhwc(
        ops.grid_sample(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(grid))
    )
    np.testing.assert_allclose(got, ref, atol=1e-6)


def _torch_warp(x, flo):
    """Reference utilities.py:100-118 re-expressed in torch for goldens."""
    B, C, H, W = x.size()
    xx = torch.arange(0, W).view(1, -1).repeat(H, 1)
    yy = torch.arange(0, H).view(-1, 1).repeat(1, W)
    xx = xx.view(1, 1, H, W).repeat(B, 1, 1, 1)
    yy = yy.view(1, 1, H, W).repeat(B, 1, 1, 1)
    grid = torch.cat((xx, yy), 1).float()
    vgrid = grid + flo
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
    return F.grid_sample(x, vgrid.permute(0, 2, 3, 1), mode="bilinear",
                         padding_mode="zeros", align_corners=False)


def test_warp_matches_reference_semantics():
    x = RNG.standard_normal((2, 3, 16, 20), dtype=np.float32)
    flo = (RNG.standard_normal((2, 2, 16, 20)) * 3).astype(np.float32)
    ref = _torch_warp(torch.from_numpy(x), torch.from_numpy(flo)).numpy()
    got = j2n_nhwc(
        ops.warp(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(flo.transpose(0, 2, 3, 1)),
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_flow_warp_mask_basic():
    # Consistent flows (f01 = -f10 = const) should be fully valid away from
    # borders; wildly inconsistent flows should be invalid.
    H, W = 16, 16
    f01 = np.zeros((H, W, 2), dtype=np.float32) + 1.0
    f10 = -f01
    mask = np.asarray(ops.flow_warp_mask(jnp.asarray(f01), jnp.asarray(f10)))
    assert mask[4:-4, 4:-4].min() == 1.0
    f10_bad = f10 + 10.0
    mask_bad = np.asarray(
        ops.flow_warp_mask(jnp.asarray(f01), jnp.asarray(f10_bad))
    )
    assert mask_bad.mean() < 0.2
