"""Golden parity of full models against the reference PyTorch modules.

The reference network modules (vit.py, adaDecoder.py, conv.py — torch-only)
are run on CPU with seeded random weights as the oracle; our flax models load
the same weights through ``mhada_tpu.interop`` and must reproduce the outputs.
This is the weight-level parity gate of SURVEY.md §7 step 2 (full LPIPS gate
needs trained checkpoints, which the reference does not ship).
"""

import numpy as np
import pytest
import jax.numpy as jnp

import refnet

pytestmark = pytest.mark.skipif(
    not refnet.available(), reason="reference torch modules unavailable"
)

torch = pytest.importorskip("torch")

from mhada_tpu.models import VisionTransformer, AdaFormer  # noqa: E402
from mhada_tpu.models.adaformer import AdaAttnTransformer, adaattn_for_loss  # noqa: E402
from mhada_tpu.interop import (  # noqa: E402
    import_vit,
    import_adaformer,
    import_adaattn_transformer,
)


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("pos_embedding", [True, False])
def test_vit_parity(pos_embedding):
    refvit, _, _ = refnet.load()
    torch.manual_seed(0)
    tmodel = refvit.VisionTransformer(pos_embedding=pos_embedding).eval()
    x = np.random.default_rng(1).uniform(0, 255, (4, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_feats = tmodel(torch.from_numpy(x))

    model = VisionTransformer(pos_embedding=pos_embedding, attn_mode="batch_coupled")
    params = import_vit(_sd(tmodel))
    feats = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))

    assert len(feats) == 3
    for ours, theirs in zip(feats, ref_feats):
        np.testing.assert_allclose(
            nchw(ours), theirs.numpy(), atol=2e-4, rtol=1e-3
        )


def test_adaformer_parity():
    refvit, refada, _ = refnet.load()
    torch.manual_seed(0)
    tmodel = refada.AdaAttnTransformerMultiHead().eval()
    rng = np.random.default_rng(2)
    fc = [rng.standard_normal((2, 512, 16, 16)).astype(np.float32) for _ in range(3)]
    fs = [rng.standard_normal((2, 512, 12, 20)).astype(np.float32) for _ in range(3)]
    with torch.no_grad():
        ref_fcs, ref_cs = tmodel(
            [torch.from_numpy(f) for f in fc], [torch.from_numpy(f) for f in fs]
        )

    model = AdaFormer()
    params = import_adaformer(_sd(tmodel))
    fcs, cs = model.apply(
        {"params": params},
        [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in fc],
        [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in fs],
    )
    np.testing.assert_allclose(nchw(fcs), ref_fcs.numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(nchw(cs), ref_cs.numpy(), atol=5e-4, rtol=1e-3)


def test_adaattn_transformer_single_head_parity():
    _, refada, _ = refnet.load()
    torch.manual_seed(3)
    tmodel = refada.AdaAttnTransformer().eval()
    rng = np.random.default_rng(4)
    fc = [rng.standard_normal((1, 512, 8, 8)).astype(np.float32) for _ in range(3)]
    fs = [rng.standard_normal((1, 512, 8, 8)).astype(np.float32) for _ in range(3)]
    with torch.no_grad():
        ref_cs = tmodel(
            [torch.from_numpy(f) for f in fc], [torch.from_numpy(f) for f in fs]
        )
    model = AdaAttnTransformer()
    params = import_adaattn_transformer(_sd(tmodel))
    cs = model.apply(
        {"params": params},
        [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in fc],
        [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in fs],
    )
    np.testing.assert_allclose(nchw(cs), ref_cs.numpy(), atol=5e-4, rtol=1e-3)


def test_adaattn_for_loss_parity():
    _, refada, _ = refnet.load()
    tmodule = refada.AdaAttnForLoss(v_dim=256, qk_dim=448).eval()
    rng = np.random.default_rng(5)
    c_x = rng.standard_normal((2, 256, 8, 8)).astype(np.float32)
    s_x = rng.standard_normal((2, 256, 8, 8)).astype(np.float32)
    c1 = rng.standard_normal((2, 448, 8, 8)).astype(np.float32)
    s1 = rng.standard_normal((2, 448, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tmodule(*(torch.from_numpy(a) for a in (c_x, s_x, c1, s1))).numpy()
    got = adaattn_for_loss(
        *(jnp.asarray(a.transpose(0, 2, 3, 1)) for a in (c_x, s_x, c1, s1))
    )
    np.testing.assert_allclose(nchw(got), ref, atol=5e-4, rtol=1e-3)


def test_cosine_activation_parity():
    _, refada, _ = refnet.load()
    tmodule = refada.AdaAttnForLoss(v_dim=64, qk_dim=64, activation="cosine").eval()
    rng = np.random.default_rng(6)
    c_x = rng.standard_normal((1, 64, 8, 8)).astype(np.float32)
    s_x = rng.standard_normal((1, 64, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tmodule(*(torch.from_numpy(a) for a in (c_x, s_x, c_x, s_x))).numpy()
    got = adaattn_for_loss(
        *(jnp.asarray(a.transpose(0, 2, 3, 1)) for a in (c_x, s_x, c_x, s_x)),
        activation="cosine",
    )
    np.testing.assert_allclose(nchw(got), ref, atol=5e-4, rtol=1e-3)


def test_style_kv_precompute_matches_full():
    """AdaFormer with precomputed style K/V must equal the full path."""
    from mhada_tpu.config import ModelConfig
    from mhada_tpu.train.train_image import build_models
    from mhada_tpu.infer.image import init_inference_params, precompute_style_kv

    models = build_models(ModelConfig(hidden_dim=64, mlp_dim=128, num_heads=4))
    params = init_inference_params(models, __import__("jax").random.PRNGKey(0))
    rng = np.random.default_rng(7)
    fc = [jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)
          for _ in range(3)]
    fs = [jnp.asarray(rng.standard_normal((1, 6, 10, 64)), jnp.float32)
          for _ in range(3)]
    ada = models["adaFormer"]
    ref_fcs, ref_cs = ada.apply({"params": params["adaFormer"]}, fc, fs)
    kv = precompute_style_kv(models, params, fs)
    got_fcs, got_cs = ada.apply({"params": params["adaFormer"]}, fc, None, kv)
    np.testing.assert_allclose(np.asarray(got_fcs), np.asarray(ref_fcs),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_cs), np.asarray(ref_cs),
                               atol=1e-5, rtol=1e-5)


def test_vit_multiscale_parity():
    refvit, _, _ = refnet.load()
    torch.manual_seed(8)
    tmodel = refvit.VisionTransformerMultiScale(pos_embedding=True).eval()
    x = np.random.default_rng(9).uniform(0, 255, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_feats = tmodel(torch.from_numpy(x))

    from mhada_tpu.models import VisionTransformerMultiScale
    from mhada_tpu.interop import import_vit_multiscale

    model = VisionTransformerMultiScale(attn_mode="batch_coupled")
    params = import_vit_multiscale(_sd(tmodel))
    feats = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(feats) == 3
    for ours, theirs in zip(feats, ref_feats):
        np.testing.assert_allclose(nchw(ours), theirs.numpy(),
                                   atol=5e-4, rtol=1e-3)


def test_encoder_block_convff_parity():
    refvit, _, _ = refnet.load()
    torch.manual_seed(10)
    tblock = refvit.EncoderBlockConvFF(num_heads=4, hidden_dim=32,
                                       mlp_dim=64).eval()
    rng = np.random.default_rng(11)
    h, w = 6, 8
    x = rng.standard_normal((2, h * w, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tblock(torch.from_numpy(x), h, w).numpy()

    from mhada_tpu.models.vit import EncoderBlockConvFF

    sd = _sd(tblock)
    params = {
        "ln1": {"scale": sd["ln1.weight"], "bias": sd["ln1.bias"]},
        "ln2": {"scale": sd["ln2.weight"], "bias": sd["ln2.bias"]},
        "attention": {
            "qkv_kernel": sd["attention.in_proj_weight"].T,
            "qkv_bias": sd["attention.in_proj_bias"],
            "out_proj": {
                "kernel": sd["attention.out_proj.weight"].T,
                "bias": sd["attention.out_proj.bias"],
            },
        },
        "mlp": {
            "conv_in": {
                "kernel": sd["mlp.convIN.weight"].transpose(2, 3, 1, 0),
                "bias": sd["mlp.convIN.bias"],
            },
            "conv_dw": {
                # torch depthwise (C,1,3,3) -> HWIO (3,3,1,C)
                "dw_kernel": sd["mlp.convDW.depthwise.weight"].transpose(2, 3, 1, 0),
                "dw_bias": sd["mlp.convDW.depthwise.bias"],
                "pointwise": {
                    "kernel": sd["mlp.convDW.pointwise.weight"].transpose(2, 3, 1, 0),
                    "bias": sd["mlp.convDW.pointwise.bias"],
                },
            },
            "conv_out": {
                "kernel": sd["mlp.convOUT.weight"].transpose(2, 3, 1, 0),
                "bias": sd["mlp.convOUT.bias"],
            },
        },
    }
    block = EncoderBlockConvFF(num_heads=4, mlp_dim=64,
                               attn_mode="batch_coupled")
    got = block.apply({"params": params}, jnp.asarray(x), (h, w))
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4, rtol=1e-3)
