"""End-to-end stylization parity: the full vit_c + vit_s + AdaFormer + clamp
pipeline vs the reference torch modules under identical seeded weights — the
strongest weight-level gate available without the (unshipped) trained
checkpoints (SURVEY.md §7 step 2)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import refnet

pytestmark = pytest.mark.skipif(
    not refnet.available(), reason="reference torch modules unavailable"
)

torch = pytest.importorskip("torch")

from mhada_tpu.config import ModelConfig  # noqa: E402
from mhada_tpu.train.train_image import build_models  # noqa: E402
from mhada_tpu.interop import import_vit, import_adaformer  # noqa: E402


def test_full_pipeline_parity():
    refvit, refada, _ = refnet.load()
    torch.manual_seed(42)
    t_vit_c = refvit.VisionTransformer(pos_embedding=True).eval()
    t_vit_s = refvit.VisionTransformer(pos_embedding=False).eval()
    t_ada = refada.AdaAttnTransformerMultiHead().eval()

    rng = np.random.default_rng(0)
    c = rng.uniform(0, 255, (1, 3, 128, 128)).astype(np.float32)
    s = rng.uniform(0, 255, (1, 3, 96, 160)).astype(np.float32)

    with torch.no_grad():
        fc = t_vit_c(torch.from_numpy(c))
        fs = t_vit_s(torch.from_numpy(s))
        _, cs = t_ada(fc, fs)
        ref = cs.clamp(0, 255).numpy()

    models = build_models(ModelConfig(attn_mode="batch_coupled"))
    params = {
        "vit_c": import_vit(
            {k: v.numpy() for k, v in t_vit_c.state_dict().items()}
        ),
        "vit_s": import_vit(
            {k: v.numpy() for k, v in t_vit_s.state_dict().items()}
        ),
        "adaFormer": import_adaformer(
            {k: v.numpy() for k, v in t_ada.state_dict().items()}
        ),
    }

    @jax.jit
    def stylize(params, c, s):
        fc = models["vit_c"].apply({"params": params["vit_c"]}, c)
        fs = models["vit_s"].apply({"params": params["vit_s"]}, s)
        _, cs = models["adaFormer"].apply(
            {"params": params["adaFormer"]}, fc, fs
        )
        return jnp.clip(cs, 0, 255)

    got = stylize(
        params,
        jnp.asarray(c.transpose(0, 2, 3, 1)),
        jnp.asarray(s.transpose(0, 2, 3, 1)),
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    # pixel-space parity in 0-255 units
    assert np.abs(got - ref).max() < 0.1
    assert np.abs(got - ref).mean() < 0.01


def test_reference_combined_checkpoint_restore(tmp_path):
    """restore_checkpoint must ingest a reference-format combined .pth
    (train_image.py:172-186 tree) and produce our param structure."""
    refvit, refada, _ = refnet.load()
    torch.manual_seed(1)
    t_vit_c = refvit.VisionTransformer(pos_embedding=True)
    t_vit_s = refvit.VisionTransformer(pos_embedding=False)
    t_ada = refada.AdaAttnTransformerMultiHead()
    ckpt = {
        "epoch": 20,
        "batch_size": 8,
        "model_state": {
            "adaFormer": t_ada.state_dict(),
            "vit_c": t_vit_c.state_dict(),
            "vit_s": t_vit_s.state_dict(),
        },
        "optim_state": {},
    }
    p = str(tmp_path / "checkpoint_epoch_20_batchSize_8.pth")
    torch.save(ckpt, p)

    from mhada_tpu.train.checkpoint import restore_checkpoint

    restored = restore_checkpoint(p)
    assert restored["epoch"] == 20
    assert restored["batch_size"] == 8
    assert restored["optim_state"] is None  # torch Adam state not importable
    ms = restored["model_state"]
    assert set(ms) == {"adaFormer", "vit_c", "vit_s"}
    # spot-check a mapped weight
    np.testing.assert_allclose(
        ms["vit_c"]["block0"]["ln1"]["scale"],
        t_vit_c.state_dict()["encoder.0.ln1.weight"].numpy(),
    )


def test_latest_checkpoint_selection(tmp_path):
    from mhada_tpu.train.checkpoint import latest_checkpoint
    import os

    for e in (1, 3, 2):
        os.makedirs(tmp_path / f"checkpoint_epoch_{e}_batchSize_8")
    os.makedirs(tmp_path / "checkpoint_epoch_9_batchSize_2")
    best = latest_checkpoint(str(tmp_path), 8)
    assert best.endswith("checkpoint_epoch_3_batchSize_8")
    assert latest_checkpoint(str(tmp_path), 4) is None
