"""Golden parity of the training losses against reference lossfn.py formulas.

The reference's lossfn.py cannot be imported here (its utilities module pulls
torchvision), so the oracles below restate lossfn.py:7-86 line-for-line in
torch; AdaAttnForLoss comes from the real reference module (refnet).
"""

import numpy as np
import pytest
import jax.numpy as jnp

import refnet

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from mhada_tpu.train import losses as L  # noqa: E402

pytestmark = pytest.mark.skipif(
    not refnet.available(), reason="reference torch modules unavailable"
)

RNG = np.random.default_rng(0)
LAYERS = ["relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1"]
CH = {"relu1_1": 64, "relu2_1": 128, "relu3_1": 256, "relu4_1": 512, "relu5_1": 512}


def fake_vgg_feats(b=2, base=32):
    t = {}
    j = {}
    size = base
    for name in LAYERS:
        x = RNG.standard_normal((b, CH[name], size, size)).astype(np.float32)
        t[name] = torch.from_numpy(x)
        j[name] = jnp.asarray(x.transpose(0, 2, 3, 1))
        size //= 2
    return t, j


def torch_global_style_loss(fcs, fs):
    mse = torch.nn.MSELoss()
    loss = 0
    for i in [1, 2, 3, 4, 5]:
        loss += mse(fcs[f"relu{i}_1"].mean(dim=(2, 3)), fs[f"relu{i}_1"].mean(dim=(2, 3)))
        loss += mse(fcs[f"relu{i}_1"].std(dim=(2, 3)), fs[f"relu{i}_1"].std(dim=(2, 3)))
    return loss


def torch_feature_down_sample(feat, last):
    size = feat[f"relu{last}_1"].shape[-2:]
    out = [
        F.interpolate(feat[f"relu{i}_1"], size=size, mode="bilinear",
                      align_corners=False)
        for i in range(1, last)
    ]
    out.append(feat[f"relu{last}_1"])
    return torch.cat(out, dim=1)


def torch_warp(x, flo):
    B, C, H, W = x.size()
    xx = torch.arange(0, W).view(1, -1).repeat(H, 1)
    yy = torch.arange(0, H).view(-1, 1).repeat(1, W)
    grid = torch.cat(
        (xx.view(1, 1, H, W).repeat(B, 1, 1, 1),
         yy.view(1, 1, H, W).repeat(B, 1, 1, 1)), 1
    ).float()
    vgrid = grid + flo
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
    return F.grid_sample(x, vgrid.permute(0, 2, 3, 1), mode="bilinear",
                         padding_mode="zeros", align_corners=False)


def test_global_style_loss():
    t, j = fake_vgg_feats()
    t2, j2 = fake_vgg_feats()
    ref = float(torch_global_style_loss(t, t2))
    got = float(L.global_style_loss(j, j2))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_identity_loss_2():
    t, j = fake_vgg_feats()
    t2, j2 = fake_vgg_feats()
    mse = torch.nn.MSELoss()
    ref = 0
    for i in [1, 2, 3, 4, 5]:
        ref += mse(t[f"relu{i}_1"], t2[f"relu{i}_1"]) * 2
    got = float(L.identity_loss_2(j, j2, j, j2))
    np.testing.assert_allclose(got, float(ref), rtol=1e-5)


def test_local_feature_loss():
    _, refada, _ = refnet.load()
    t_fc, j_fc = fake_vgg_feats(b=1, base=32)
    t_fs, j_fs = fake_vgg_feats(b=1, base=32)
    t_fcs, j_fcs = fake_vgg_feats(b=1, base=32)

    modules = [
        refada.AdaAttnForLoss(256, 64 + 128 + 256),
        refada.AdaAttnForLoss(512, 64 + 128 + 256 + 512),
        refada.AdaAttnForLoss(512, 64 + 128 + 256 + 512 + 512),
    ]
    mse = torch.nn.MSELoss()
    ref = 0
    with torch.no_grad():
        for idx, i in enumerate([3, 4, 5]):
            c1 = torch_feature_down_sample(t_fc, i)
            s1 = torch_feature_down_sample(t_fs, i)
            tgt = modules[idx](t_fc[f"relu{i}_1"], t_fs[f"relu{i}_1"], c1, s1)
            ref += mse(t_fcs[f"relu{i}_1"], tgt)
    got = float(L.local_feature_loss(j_fc, j_fs, j_fcs))
    np.testing.assert_allclose(got, float(ref), rtol=1e-4)


def test_output_level_temporal_loss():
    B, H, W = 2, 16, 24
    c1 = RNG.standard_normal((B, 3, H, W)).astype(np.float32) * 50 + 128
    c2 = RNG.standard_normal((B, 3, H, W)).astype(np.float32) * 50 + 128
    cs1 = RNG.standard_normal((B, 3, H, W)).astype(np.float32) * 50 + 128
    cs2 = RNG.standard_normal((B, 3, H, W)).astype(np.float32) * 50 + 128
    flow = (RNG.standard_normal((B, 2, H, W)) * 2).astype(np.float32)
    mask = (RNG.uniform(size=(B, H, W)) > 0.3).astype(np.float32)

    # reference lossfn.py:50-66
    tc1, tc2, tcs1, tcs2 = map(torch.from_numpy, (c1, c2, cs1, cs2))
    tflow, tmask = torch.from_numpy(flow), torch.from_numpy(mask)
    warped_c1 = torch_warp(tc1, tflow)
    warped_cs1 = torch_warp(tcs1, tflow)
    input_term = tc2 - warped_c1
    input_term = (0.2126 * input_term[:, 0] + 0.7152 * input_term[:, 1]
                  + 0.0722 * input_term[:, 2])
    input_term = input_term.unsqueeze(1).expand(-1, 3, -1, -1)
    output_term = tcs2 - warped_cs1
    m = tmask.unsqueeze(1).expand(-1, 3, -1, -1)
    lm = torch.nn.MSELoss(reduction="none")
    ref = torch.sum(m * lm(output_term, input_term)) / torch.nonzero(m).shape[0]

    got = float(
        L.output_level_temporal_loss(
            *(jnp.asarray(x.transpose(0, 2, 3, 1)) for x in (c1, c2, cs1, cs2)),
            jnp.asarray(flow.transpose(0, 2, 3, 1)),
            jnp.asarray(mask),
        )
    )
    np.testing.assert_allclose(got, float(ref), rtol=1e-4)


def test_feature_level_temporal_loss():
    B, C, h, w = 2, 8, 4, 6
    H, W = 16, 24
    f1 = RNG.standard_normal((B, C, h, w)).astype(np.float32)
    f2 = RNG.standard_normal((B, C, h, w)).astype(np.float32)
    flow = (RNG.standard_normal((B, 2, H, W)) * 2).astype(np.float32)
    mask = (RNG.uniform(size=(B, H, W)) > 0.3).astype(np.float32)

    # reference lossfn.py:69-86
    tf1, tf2 = torch.from_numpy(f1), torch.from_numpy(f2)
    tflow, tmask = torch.from_numpy(flow), torch.from_numpy(mask)
    ff = F.interpolate(tflow, size=(h, w), mode="bilinear")
    ff[:, 0] *= float(w) / W
    ff[:, 1] *= float(h) / H
    warped = torch_warp(tf1, ff)
    fm = F.interpolate(tmask.unsqueeze(1), size=(h, w), mode="bilinear").squeeze(1)
    fm = (fm > 0).float().unsqueeze(1).expand(-1, C, -1, -1)
    lm = torch.nn.MSELoss(reduction="none")
    ref = torch.sum(fm * lm(tf2, warped)) / torch.nonzero(fm).shape[0]

    got = float(
        L.feature_level_temporal_loss(
            jnp.asarray(f1.transpose(0, 2, 3, 1)),
            jnp.asarray(f2.transpose(0, 2, 3, 1)),
            jnp.asarray(flow.transpose(0, 2, 3, 1)),
            jnp.asarray(mask),
        )
    )
    np.testing.assert_allclose(got, float(ref), rtol=1e-4)


def test_temporal_losses_empty_mask_is_zero_not_nan():
    """An all-zero validity mask (fully occluded flow, or a sparse mask
    whose support the feature-grid downsample misses) must give zero loss
    with finite gradients — not the reference expression's 0/0 NaN, which
    would poison a whole training run (losses._masked_mean)."""
    import jax

    from mhada_tpu.train import losses as L

    rng = np.random.default_rng(9)
    c1 = jnp.asarray(rng.uniform(0, 255, (1, 16, 16, 3)), jnp.float32)
    c2 = jnp.asarray(rng.uniform(0, 255, (1, 16, 16, 3)), jnp.float32)
    f1 = jnp.asarray(rng.standard_normal((1, 2, 2, 8)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, 2, 2, 8)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((1, 16, 16, 2)), jnp.float32)
    zero_mask = jnp.zeros((1, 16, 16), jnp.float32)

    assert float(L.output_level_temporal_loss(
        c1, c2, c1, c2, flow, zero_mask)) == 0.0
    assert float(L.feature_level_temporal_loss(
        f1, f2, flow, zero_mask)) == 0.0
    g = jax.grad(lambda a: L.feature_level_temporal_loss(
        a, f2, flow, zero_mask))(f1)
    assert np.isfinite(np.asarray(g)).all()

    # non-empty masks keep the reference semantics (plain masked mean)
    ones = jnp.ones((1, 16, 16), jnp.float32)
    got = float(L.output_level_temporal_loss(c1, c2, c1, c2, flow, ones))
    assert np.isfinite(got) and got > 0
