"""Interop: pure-python .pth reader vs torch.save, and VGG19 weight-import
golden parity against a torch-built oracle with torchvision's layer layout."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mhada_tpu.interop import load_pth, import_vgg19  # noqa: E402


def test_pth_reader_roundtrip(tmp_path):
    tensors = {
        "a.weight": torch.randn(4, 3, 3, 3),
        "a.bias": torch.randn(4),
        "nested": {"b": torch.arange(10, dtype=torch.int64)},
        "scalar": torch.tensor(3.5),
        "half": torch.randn(5).half(),
    }
    p = str(tmp_path / "x.pth")
    torch.save(tensors, p)
    got = load_pth(p)
    np.testing.assert_allclose(got["a.weight"], tensors["a.weight"].numpy())
    np.testing.assert_allclose(got["a.bias"], tensors["a.bias"].numpy())
    np.testing.assert_array_equal(got["nested"]["b"],
                                  tensors["nested"]["b"].numpy())
    assert float(got["scalar"]) == 3.5
    np.testing.assert_allclose(got["half"], tensors["half"].numpy())


def test_pth_reader_noncontiguous(tmp_path):
    t = torch.randn(6, 8).t()  # transposed view -> non-default strides
    p = str(tmp_path / "nc.pth")
    torch.save({"t": t}, p)
    got = load_pth(p)
    np.testing.assert_allclose(got["t"], t.numpy())


def _torch_vgg19_features():
    """torchvision VGG19 'features' layout (cfg E), random weights."""
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers = []
    c_in = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(c_in, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            c_in = v
    return nn.Sequential(*layers)


def test_vgg19_import_golden(tmp_path):
    """Full VGG19Features forward vs the torch oracle (same weights)."""
    import torch.nn.functional as F

    torch.manual_seed(0)
    feats = _torch_vgg19_features().eval()
    sd = {f"features.{i}.{k}": v for i, m in enumerate(feats)
          for k, v in m.state_dict().items()}
    sd = {k: v.numpy() for k, v in sd.items()}

    from mhada_tpu.models import VGG19Features

    params = import_vgg19(sd)
    model = VGG19Features()

    x = np.random.default_rng(0).uniform(0, 255, (1, 3, 64, 64)).astype(np.float32)
    # oracle: normalise like reference vgg19.py:6-12, tap at relu{k}_1
    xt = torch.from_numpy(x)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(-1, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(-1, 1, 1)
    h = (xt / 255.0 - mean) / std
    taps = {}
    tap_idx = {1: "relu1_1", 6: "relu2_1", 11: "relu3_1", 20: "relu4_1",
               29: "relu5_1"}
    with torch.no_grad():
        for i, m in enumerate(feats):
            h = m(h)
            if i in tap_idx:
                taps[tap_idx[i]] = h.numpy()

    got = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    for name, ref in taps.items():
        np.testing.assert_allclose(
            np.asarray(got[name]).transpose(0, 3, 1, 2), ref,
            atol=1e-4, rtol=1e-4,
        )


def test_blocked_unpickle_rejects_arbitrary_classes(tmp_path):
    """The restricted unpickler must refuse non-tensor payloads."""
    import pickle
    import zipfile

    p = str(tmp_path / "evil.pth")
    with zipfile.ZipFile(p, "w") as zf:
        # function-by-reference payload (builtins.print) must be refused
        zf.writestr("archive/data.pkl", pickle.dumps(print))
    with pytest.raises(pickle.UnpicklingError, match="blocked"):
        load_pth(p)


def test_export_import_roundtrip():
    """our params -> torch state_dict -> our params must be identity."""
    import jax
    import jax.numpy as jnp

    from mhada_tpu.models import VisionTransformer, AdaFormer
    from mhada_tpu.interop import (
        import_vit, import_adaformer,
    )
    from mhada_tpu.interop.torch_export import export_vit, export_adaformer

    vit = VisionTransformer(hidden_dim=64, mlp_dim=128, num_heads=4)
    pv = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    rt = import_vit({k: np.asarray(v) for k, v in export_vit(pv).items()})
    a_map = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(pv)}
    b_map = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(rt)}
    assert set(a_map) == set(b_map)
    for k in a_map:
        np.testing.assert_array_equal(np.asarray(a_map[k]),
                                      np.asarray(b_map[k]))

    ada = AdaFormer(num_heads=4)
    fc = [jnp.zeros((1, 4, 4, 64))] * 3
    pa = ada.init(jax.random.PRNGKey(1), fc, fc)["params"]
    rt = import_adaformer(export_adaformer(pa, num_heads=4), num_heads=4)
    la = jax.tree_util.tree_leaves(pa)
    lb = jax.tree_util.tree_leaves(rt)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_loads_into_reference_module():
    """Exported state_dict must load strict=True into the reference module."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    import refnet

    if not refnet.available():
        pytest.skip("reference unavailable")
    refvit, refada, _ = refnet.load()
    import jax
    import jax.numpy as jnp

    from mhada_tpu.models import VisionTransformer
    from mhada_tpu.interop.torch_export import export_vit

    vit = VisionTransformer()  # full size to match reference defaults
    pv = jax.jit(vit.init)(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))["params"]
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_vit(pv).items()}
    tmodel = refvit.VisionTransformer(pos_embedding=True)
    tmodel.load_state_dict(sd, strict=True)


def test_orbax_weight_snapshot_infer_roundtrip(tmp_path):
    """save_weights (our training's per-network orbax snapshots) ->
    infer.image.load_orbax_params: the exact triple the infer CLI's
    --ada/--vitc/--vits orbax branch consumes."""
    import jax
    import jax.numpy as jnp

    from mhada_tpu.config import ImageTrainConfig, ModelConfig
    from mhada_tpu.train import checkpoint as ckpt
    from mhada_tpu.train.train_image import init_params
    from mhada_tpu.infer.image import load_orbax_params

    tiny = ModelConfig(hidden_dim=64, mlp_dim=128, num_heads=4)
    cfg = ImageTrainConfig(model=tiny, batch_size=2, image_size=(32, 32))
    params = init_params(jax.random.PRNGKey(0), cfg)["trainable"]
    ckpt.save_weights(str(tmp_path), params, suffix="_epoch_3_batchSize_2")
    loaded = load_orbax_params(
        str(tmp_path / "AdaFormer_epoch_3_batchSize_2"),
        str(tmp_path / "ViT_C_epoch_3_batchSize_2"),
        str(tmp_path / "ViT_S_epoch_3_batchSize_2"),
    )
    flat_a, _ = jax.flatten_util.ravel_pytree(jax.device_get(params))
    flat_b, _ = jax.flatten_util.ravel_pytree(jax.device_get(loaded))
    np.testing.assert_array_equal(np.asarray(flat_a), np.asarray(flat_b))
