"""Golden tests: JAX RAFT-large vs the plain-torch restatement.

Random weights are shared through ``import_raft`` (the same path a real
torchvision ``raft_large`` .pth takes), then encoders, correlation lookup
and the full 12-iteration forward are compared.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests import torch_backbones as tb  # noqa: E402
from tests import torch_raft as tr  # noqa: E402

from mhada_tpu.models.raft import (  # noqa: E402
    RAFT, RAFTEncoder, build_corr_pyramid, lookup_corr, import_raft,
)


@pytest.fixture(scope="module")
def ref_model():
    m = tr.RAFTRef()
    tb._randomize(m, seed=11)
    return m


@pytest.fixture(scope="module")
def params(ref_model):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    return import_raft(sd)


def _nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _pair(seed=0, h=128, w=160, b=1):
    g = torch.Generator().manual_seed(seed)
    i1 = torch.rand(b, 3, h, w, generator=g) * 2 - 1
    i2 = torch.rand(b, 3, h, w, generator=g) * 2 - 1
    return i1, i2


def test_feature_encoder_golden(ref_model, params):
    i1, _ = _pair()
    with torch.no_grad():
        ref = ref_model.feature_encoder(i1)
    got = RAFTEncoder(norm="instance").apply(
        {"params": params["feature_encoder"]}, _nhwc(i1))
    np.testing.assert_allclose(
        np.asarray(got), ref.numpy().transpose(0, 2, 3, 1), atol=2e-4)


def test_context_encoder_golden(ref_model, params):
    i1, _ = _pair(1)
    with torch.no_grad():
        ref = ref_model.context_encoder(i1)
    got = RAFTEncoder(norm="batch").apply(
        {"params": params["context_encoder"]}, _nhwc(i1))
    np.testing.assert_allclose(
        np.asarray(got), ref.numpy().transpose(0, 2, 3, 1), atol=2e-4)


def test_corr_lookup_golden(ref_model):
    """Pyramid build + 4-level 81-point lookup vs torch grid_sample, at
    off-grid query coordinates (exercises the bilinear taps and padding)."""
    # level-3 dims must stay >= 2: torch normalises grids by (size - 1), so a
    # size-1 pyramid level is degenerate (NaN) in torchvision as well.
    g = torch.Generator().manual_seed(3)
    b, c, h, w = 1, 32, 16, 24
    f1 = torch.randn(b, c, h, w, generator=g)
    f2 = torch.randn(b, c, h, w, generator=g)
    cb = tr.CorrBlock()
    cb.build_pyramid(f1, f2)
    coords = tr.make_coords_grid(b, h, w) + torch.randn(
        b, 2, h, w, generator=g) * 2.0
    with torch.no_grad():
        ref = cb.index_pyramid(coords)  # (b, 324, h, w)

    pyr = build_corr_pyramid(_nhwc(f1), _nhwc(f2))
    got = lookup_corr(pyr, _nhwc(coords))
    np.testing.assert_allclose(
        np.asarray(got), ref.numpy().transpose(0, 2, 3, 1), atol=1e-4)


def test_raft_full_forward_golden(ref_model, params):
    i1, i2 = _pair(7)
    with torch.no_grad():
        flows_t = ref_model(i1, i2, num_flow_updates=12)
    flows = RAFT(num_iters=12).apply({"params": params}, _nhwc(i1), _nhwc(i2))
    assert flows.shape == (12, 1, 128, 160, 2)
    ref = flows_t[-1].numpy().transpose(0, 2, 3, 1)
    got = np.asarray(flows[-1])
    scale = max(1.0, float(np.abs(ref).max()))
    err = float(np.abs(got - ref).max())
    assert err <= 1e-3 * scale, f"final flow max err {err} (scale {scale})"
    # and an early iteration, to catch drift hidden by convergence
    ref0 = flows_t[0].numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(flows[0]), ref0, atol=1e-3)


def test_raft_flow_fn_from_pth(ref_model, tmp_path):
    """End-to-end: torch-save the oracle's weights, read them back through
    load_pth -> import_raft -> jitted flow_fn with the reference's
    [0,255]->[-1,1] raftTransforms normalisation."""
    from mhada_tpu.data.flow_models import make_raft_flow_fn

    path = str(tmp_path / "raft_large.pth")
    torch.save(ref_model.state_dict(), path)
    fn = make_raft_flow_fn(path, num_iters=4)

    i1, i2 = _pair(9)
    img1 = ((i1[0].numpy().transpose(1, 2, 0) + 1) * 127.5).astype(np.float32)
    img2 = ((i2[0].numpy().transpose(1, 2, 0) + 1) * 127.5).astype(np.float32)
    got = fn(img1, img2)
    with torch.no_grad():
        ref = ref_model(i1, i2, num_flow_updates=4)[-1]
    np.testing.assert_allclose(
        got, ref[0].numpy().transpose(1, 2, 0), atol=2e-3)


def test_raft_init_shapes():
    """From-scratch init works (no imported weights needed to compile)."""
    import jax

    model = RAFT(num_iters=2)
    i = jnp.zeros((1, 32, 40, 3))
    p = model.init(jax.random.PRNGKey(0), i, i)["params"]
    flows = model.apply({"params": p}, i, i)
    assert flows.shape == (2, 1, 32, 40, 2)
