"""mhada_tpu param trees -> reference-format torch state_dicts.

Inverse of torch_import: lets users move trained weights back into the
reference's PyTorch modules (or any torch tooling).  Returns plain
{name: numpy} dicts in the reference's naming (vit.py / adaDecoder.py /
conv.py); ``save_pth`` writes them with torch when available.
"""

from typing import Dict

import numpy as np


def _conv(k: np.ndarray) -> np.ndarray:
    """HWIO -> torch OIHW."""
    return np.ascontiguousarray(np.asarray(k).transpose(3, 2, 0, 1))


def _lin(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(k).T)


def export_vit(params: Dict, num_layers: int = 3) -> Dict[str, np.ndarray]:
    sd = {
        "patch_embedding.conv_proj.weight": _conv(
            params["patch_embedding"]["proj"]["kernel"]
        ),
        "patch_embedding.conv_proj.bias": np.asarray(
            params["patch_embedding"]["proj"]["bias"]
        ),
    }
    if "pos_embedding" in params:
        sd["pos_embedding.pos_embed"] = np.ascontiguousarray(
            np.asarray(params["pos_embedding"]["pos_embed"]).transpose(0, 3, 1, 2)
        )
    for i in range(num_layers):
        b = params[f"block{i}"]
        t = f"encoder.{i}."
        sd[t + "ln1.weight"] = np.asarray(b["ln1"]["scale"])
        sd[t + "ln1.bias"] = np.asarray(b["ln1"]["bias"])
        sd[t + "ln2.weight"] = np.asarray(b["ln2"]["scale"])
        sd[t + "ln2.bias"] = np.asarray(b["ln2"]["bias"])
        sd[t + "attention.in_proj_weight"] = _lin(b["attention"]["qkv_kernel"])
        sd[t + "attention.in_proj_bias"] = np.asarray(b["attention"]["qkv_bias"])
        sd[t + "attention.out_proj.weight"] = _lin(
            b["attention"]["out_proj"]["kernel"]
        )
        sd[t + "attention.out_proj.bias"] = np.asarray(
            b["attention"]["out_proj"]["bias"]
        )
        sd[t + "mlp.0.weight"] = _lin(b["mlp_fc1"]["kernel"])
        sd[t + "mlp.0.bias"] = np.asarray(b["mlp_fc1"]["bias"])
        sd[t + "mlp.2.weight"] = _lin(b["mlp_fc2"]["kernel"])
        sd[t + "mlp.2.bias"] = np.asarray(b["mlp_fc2"]["bias"])
    return sd


_DECODER_MAP = {
    "up1": "conv1.0", "c1": "conv1.1", "c2": "conv1.2", "c3": "conv1.3",
    "up2": "conv1.4", "c4": "conv2.0", "up3": "conv2.1", "c5": "conv3.0",
    "c6": "conv3.1",
}


def export_decoder(params: Dict, prefix: str = "decoder.") -> Dict:
    sd = {}
    for ours, theirs in _DECODER_MAP.items():
        sd[f"{prefix}{theirs}.conv.conv.weight"] = _conv(
            params[ours]["conv"]["kernel"]
        )
        sd[f"{prefix}{theirs}.conv.conv.bias"] = np.asarray(
            params[ours]["conv"]["bias"]
        )
    return sd


def export_adaformer(
    params: Dict, num_layers: int = 3, num_heads: int = 8
) -> Dict[str, np.ndarray]:
    sd = {}
    for j in range(num_layers * 2):
        p = params[f"ada{j}"]
        t = f"adaAttnHead.{j}."
        for name in ("f", "g", "h"):
            for h in range(num_heads):
                sd[f"{t}{name}_list.{h}.weight"] = np.ascontiguousarray(
                    np.asarray(p[f"{name}_kernel"][h]).T[:, :, None, None]
                )
                sd[f"{t}{name}_list.{h}.bias"] = np.asarray(
                    p[f"{name}_bias"][h]
                )
        sd[t + "out_conv.weight"] = np.ascontiguousarray(
            np.asarray(p["out_kernel"]).T[:, :, None, None]
        )
        sd[t + "out_conv.bias"] = np.asarray(p["out_bias"])
    sd.update(export_decoder(params["decoder"]))
    return sd


def save_pth(path: str, sd: Dict[str, np.ndarray]) -> None:
    """Write a torch-loadable .pth (requires torch on this host)."""
    import torch

    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)
