"""PyTorch state_dict -> mhada_tpu param-tree importers.

Maps the reference's torch module trees (network/vit.py, network/adaDecoder.py,
network/conv.py, torchvision VGG19) onto our flax param trees, transposing
kernels into TPU-native layouts (conv OIHW -> HWIO, linear (out,in) -> (in,out),
NCHW pos grid -> NHWC).
"""

from typing import Dict

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _lin(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def import_vit(sd: Dict[str, np.ndarray], num_layers: int = 3) -> Dict:
    """Reference VisionTransformer state_dict -> params (vit.py:120-169)."""
    p: Dict = {
        "patch_embedding": {
            "proj": {
                "kernel": _conv(sd["patch_embedding.conv_proj.weight"]),
                "bias": sd["patch_embedding.conv_proj.bias"],
            }
        }
    }
    if "pos_embedding.pos_embed" in sd:
        p["pos_embedding"] = {
            "pos_embed": np.ascontiguousarray(
                sd["pos_embedding.pos_embed"].transpose(0, 2, 3, 1)
            )
        }
    for i in range(num_layers):
        t = f"encoder.{i}."
        p[f"block{i}"] = {
            "ln1": {"scale": sd[t + "ln1.weight"], "bias": sd[t + "ln1.bias"]},
            "ln2": {"scale": sd[t + "ln2.weight"], "bias": sd[t + "ln2.bias"]},
            "attention": {
                "qkv_kernel": _lin(sd[t + "attention.in_proj_weight"]),
                "qkv_bias": sd[t + "attention.in_proj_bias"],
                "out_proj": {
                    "kernel": _lin(sd[t + "attention.out_proj.weight"]),
                    "bias": sd[t + "attention.out_proj.bias"],
                },
            },
            "mlp_fc1": {
                "kernel": _lin(sd[t + "mlp.0.weight"]),
                "bias": sd[t + "mlp.0.bias"],
            },
            "mlp_fc2": {
                "kernel": _lin(sd[t + "mlp.2.weight"]),
                "bias": sd[t + "mlp.2.bias"],
            },
        }
    return p


def import_vit_multiscale(sd: Dict[str, np.ndarray], num_layers: int = 3) -> Dict:
    """Reference VisionTransformerMultiScale state_dict (vit.py:172-236) ->
    VisionTransformerMultiScale params (adds stride-2 repatch embeddings)."""
    p = import_vit(sd, num_layers)
    for i in range(num_layers - 1):
        p[f"repatch{i}"] = {
            "proj": {
                "kernel": _conv(sd[f"repatch.{i}.conv_proj.weight"]),
                "bias": sd[f"repatch.{i}.conv_proj.bias"],
            }
        }
    return p


def _import_mhada_block(sd: Dict[str, np.ndarray], prefix: str, num_heads: int) -> Dict:
    """One AdaAttnMultiHead: per-head 1x1 convs -> (heads, d, d) stacks."""

    def stack(name):
        ks = []
        bs = []
        for h in range(num_heads):
            w = sd[f"{prefix}{name}_list.{h}.weight"]  # (d, d, 1, 1)
            ks.append(w[:, :, 0, 0].T)
            bs.append(sd[f"{prefix}{name}_list.{h}.bias"])
        return np.stack(ks), np.stack(bs)

    fk, fb = stack("f")
    gk, gb = stack("g")
    hk, hb = stack("h")
    return {
        "f_kernel": fk, "f_bias": fb,
        "g_kernel": gk, "g_bias": gb,
        "h_kernel": hk, "h_bias": hb,
        "out_kernel": sd[f"{prefix}out_conv.weight"][:, :, 0, 0].T,
        "out_bias": sd[f"{prefix}out_conv.bias"],
    }


_DECODER_MAP = {
    "up1": "conv1.0", "c1": "conv1.1", "c2": "conv1.2", "c3": "conv1.3",
    "up2": "conv1.4", "c4": "conv2.0", "up3": "conv2.1", "c5": "conv3.0",
    "c6": "conv3.1",
}


def import_decoder(sd: Dict[str, np.ndarray], prefix: str = "decoder.") -> Dict:
    """Reference Decoder (conv.py:75-100) -> our Decoder params."""
    p = {}
    for ours, theirs in _DECODER_MAP.items():
        p[ours] = {
            "conv": {
                "kernel": _conv(sd[f"{prefix}{theirs}.conv.conv.weight"]),
                "bias": sd[f"{prefix}{theirs}.conv.conv.bias"],
            }
        }
    return p


def import_adaformer(
    sd: Dict[str, np.ndarray], num_layers: int = 3, num_heads: int = 8
) -> Dict:
    """Reference AdaAttnTransformerMultiHead state_dict -> AdaFormer params."""
    p: Dict = {}
    for j in range(num_layers * 2):
        p[f"ada{j}"] = _import_mhada_block(sd, f"adaAttnHead.{j}.", num_heads)
    p["decoder"] = import_decoder(sd)
    return p


def import_adaattn_transformer(sd: Dict[str, np.ndarray], num_layers: int = 3) -> Dict:
    """Reference single-head AdaAttnTransformer (adaDecoder.py:209-232)."""
    p: Dict = {}
    for j in range(num_layers):
        t = f"adaAttNs.{j}."
        p[f"ada{j}"] = {
            "f_kernel": sd[t + "f.weight"][:, :, 0, 0].T,
            "f_bias": sd[t + "f.bias"],
            "g_kernel": sd[t + "g.weight"][:, :, 0, 0].T,
            "g_bias": sd[t + "g.bias"],
            "h_kernel": sd[t + "h.weight"][:, :, 0, 0].T,
            "h_bias": sd[t + "h.bias"],
        }
    p["decoder"] = import_decoder(sd)
    return p


_VGG19_IDX = {
    "conv1_1": 0, "conv1_2": 2, "conv2_1": 5, "conv2_2": 7,
    "conv3_1": 10, "conv3_2": 12, "conv3_3": 14, "conv3_4": 16,
    "conv4_1": 19, "conv4_2": 21, "conv4_3": 23, "conv4_4": 25,
    "conv5_1": 28,
}


def import_vgg19(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision VGG19 ``features.*`` weights (or the reference VGG19's
    ``sliceN.*`` naming, vgg19.py:20-44) -> VGG19Features params."""
    # Normalise reference slice naming to features indices.
    if any(k.startswith("slice") for k in sd):
        sd = {
            f"features.{k.split('.')[1]}.{k.split('.')[2]}": v
            for k, v in sd.items()
            if k.startswith("slice")
        }
    p = {}
    for name, idx in _VGG19_IDX.items():
        key = f"features.{idx}.weight"
        if key not in sd:
            raise KeyError(f"missing VGG19 weight {key}")
        p[name] = {
            "kernel": _conv(sd[key]),
            "bias": sd[f"features.{idx}.bias"],
        }
    return p
