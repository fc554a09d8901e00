"""Single-pair image stylization (reference infer_image.py:47-94).

Loads content/style images, runs the jitted vit_c/vit_s/AdaFormer forward,
clamps to [0, 255] and saves PNGs.  Checkpoints: our orbax format or imported
reference ``.pth`` files (``--ada/--vitc/--vits``); random init if absent
(smoke mode).
"""

import argparse
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..utils.image_io import load_image, save_image


def init_inference_params(
    models: Dict, rng: jax.Array, size_hw: Tuple[int, int] = (64, 64)
) -> Dict:
    """Random-init {vit_c, vit_s, adaFormer} params (CPU-side, fast).

    Params are input-size independent, so init always runs at a small size —
    flax ``init`` executes the forward, and a 512^2 eager attention on the
    host CPU takes minutes.
    """
    del size_hw  # kept for API compatibility; init is size-independent
    h, w = 64, 64
    # init executes the forward: run it on CPU with the naive MHAda backend
    # (param structure is backend-independent; the Pallas kernel has no CPU
    # compile path).
    # param structure is backend-independent; the Pallas kernels (incl.
    # the fused decoder tail) have no CPU compile path, and the plain
    # "col" decoder shares the tail's param tree
    pd = models["adaFormer"].packed_decoder
    ada_init = models["adaFormer"].clone(
        use_pallas=False,
        packed_decoder="col"
        if isinstance(pd, str) and (pd == "col_tail" or pd.startswith("mega"))
        else pd,
    )
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        k1, k2, k3 = jax.random.split(rng, 3)
        p_vc = models["vit_c"].init(k1, x)["params"]
        p_vs = models["vit_s"].init(k2, x)["params"]
        fc = models["vit_c"].apply({"params": p_vc}, x)
        fs = models["vit_s"].apply({"params": p_vs}, x)
        p_ada = ada_init.init(k3, fc, fs)["params"]
    params = {"vit_c": p_vc, "vit_s": p_vs, "adaFormer": p_ada}
    from ..utils.device import commit_to_device

    return commit_to_device(params)


def load_pth_params(ada_path: str, vitc_path: str, vits_path: str) -> Dict:
    """Import a trained reference checkpoint triple (infer_image.py:55-57)."""
    from ..interop import load_pth, import_vit, import_adaformer
    from ..utils.device import commit_to_device

    return commit_to_device({
        "vit_c": import_vit(load_pth(vitc_path)),
        "vit_s": import_vit(load_pth(vits_path)),
        "adaFormer": import_adaformer(load_pth(ada_path)),
    })


def load_ckpt_params(ada_path: str, vitc_path: str, vits_path: str) -> Dict:
    """Dispatch on checkpoint kind: reference ``.pth`` files -> the
    torch-free pickle importers; directories -> our own training's orbax
    weight snapshots.  Every inference/eval/analysis CLI's --ada/--vitc/
    --vits goes through here."""
    if ada_path.endswith(".pth"):
        return load_pth_params(ada_path, vitc_path, vits_path)
    import os

    assert os.path.isdir(ada_path), ada_path
    return load_orbax_params(ada_path, vitc_path, vits_path)


def default_attn_mode(ada_path) -> str:
    """Reference .pth triples were trained with the batch-coupled quirk;
    our own orbax snapshots (and random weights) are spatial."""
    return "batch_coupled" if (
        ada_path and str(ada_path).endswith(".pth")) else "spatial"


def load_orbax_params(ada_path: str, vitc_path: str, vits_path: str) -> Dict:
    """Load a weight-snapshot triple produced by our own training
    (train/checkpoint.py::save_weights: orbax dirs AdaFormer/ViT_C/ViT_S)."""
    import os

    import orbax.checkpoint as ocp

    from ..utils.device import commit_to_device

    r = ocp.StandardCheckpointer()
    return commit_to_device({
        "vit_c": r.restore(os.path.abspath(vitc_path)),
        "vit_s": r.restore(os.path.abspath(vits_path)),
        "adaFormer": r.restore(os.path.abspath(ada_path)),
    })


def make_stylize_fn(models: Dict, dtype=jnp.float32):
    """Jitted ``fn(params, content, style) -> cs`` (0-255 clamped).

    ``dtype`` is the compute dtype: bfloat16 halves HBM traffic on the
    attention path (params stay f32; output clamps in f32).
    """

    @jax.jit
    def fn(params, content, style):
        c = content.astype(dtype)
        s = style.astype(dtype)
        fc = models["vit_c"].apply({"params": params["vit_c"]}, c)
        fs = models["vit_s"].apply({"params": params["vit_s"]}, s)
        _, cs = models["adaFormer"].apply({"params": params["adaFormer"]}, fc, fs)
        return jnp.clip(cs.astype(jnp.float32), 0, 255)

    return fn


def make_encode_style_fn(models: Dict, dtype=jnp.float32):
    """Jitted style encoder — amortised once per style for video streaming
    (reference infer_video.py:58-61)."""

    @jax.jit
    def fn(params, style):
        return models["vit_s"].apply(
            {"params": params["vit_s"]}, style.astype(dtype)
        )

    return fn


def make_stylize_with_fs_fn(models: Dict, dtype=jnp.float32):
    """Jitted ``fn(params, content, fs) -> cs`` with precomputed style feats."""

    @jax.jit
    def fn(params, content, fs):
        fc = models["vit_c"].apply(
            {"params": params["vit_c"]}, content.astype(dtype)
        )
        _, cs = models["adaFormer"].apply({"params": params["adaFormer"]}, fc, fs)
        return jnp.clip(cs.astype(jnp.float32), 0, 255)

    return fn


def precompute_style_kv(models: Dict, params: Dict, fs):
    """Hoist ALL style-only MHAda work out of the streaming loop.

    Per block j (layer i = j // 2): K = g_j(IN(fs_tok_i)), V = h_j(fs_tok_i)
    — exactly AdaAttnMultiHead's key/value path (models/adaformer.py), which
    depends only on the style features.  Returns a list of 2*num_layers
    (k, v) tuples shaped TOKEN-MAJOR (B, M, C) (channel slot = head*d + e,
    the layout the fused token-major kernel consumes directly) for
    ``AdaFormer(..., style_kv=...)``.
    """
    from ..ops.instance_norm import instance_norm_tokens

    ada = models["adaFormer"]
    pa = params["adaFormer"]
    H = ada.num_heads

    @jax.jit
    def fn(pa, fs):
        kv = []
        for i in range(ada.num_layers):
            f = fs[i]
            b, h, w, c = f.shape
            tok = f.reshape(b, h * w, c)
            d = c // H
            m = tok.shape[1]
            kn = instance_norm_tokens(tok).reshape(b, m, H, d)
            raw = tok.reshape(b, m, H, d)
            for j in (2 * i, 2 * i + 1):
                p = pa[f"ada{j}"]
                dt = tok.dtype
                k = jnp.einsum("bmhd,hde->bmhe", kn, p["g_kernel"].astype(dt)) \
                    + p["g_bias"].astype(dt)
                v = jnp.einsum("bmhd,hde->bmhe", raw, p["h_kernel"].astype(dt)) \
                    + p["h_bias"].astype(dt)
                kv.append((k.reshape(b, m, c), v.reshape(b, m, c)))
        return kv

    return fn(pa, fs)


def make_stylize_with_kv_fn(models: Dict, dtype=jnp.float32):
    """Jitted streaming forward with fully precomputed style K/V
    (the fastest per-frame path: vit_c + MHAda-with-cached-KV + decoder)."""

    @jax.jit
    def fn(params, content, style_kv):
        fc = models["vit_c"].apply(
            {"params": params["vit_c"]}, content.astype(dtype)
        )
        _, cs = models["adaFormer"].apply(
            {"params": params["adaFormer"]}, fc, None, style_kv
        )
        return jnp.clip(cs.astype(jnp.float32), 0, 255)

    return fn


def stylize_image(
    params: Dict,
    models: Dict,
    content: np.ndarray,
    style: np.ndarray,
    dtype=jnp.float32,
):
    """content/style: HWC float32 0-255 -> stylized HWC float32 0-255."""
    fn = make_stylize_fn(models, dtype)
    out = fn(params, jnp.asarray(content)[None], jnp.asarray(style)[None])
    return np.asarray(out[0])


def save_feature_heatmaps(
    fc, fs, fcs, out_dir: str, num_heads: int = 8
) -> None:
    """Diagnostic heatmaps (reference infer_image.py:97-184): per-layer mean
    feature maps of fc/fs and per-head channel-group means of fcs, fc[-1],
    fs[-1]."""
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)

    def heat(arr2d, title, path):
        plt.figure(figsize=(8, 8))
        plt.imshow(np.asarray(arr2d), cmap="viridis")
        plt.colorbar()
        plt.title(title)
        plt.xlabel("Token")
        plt.ylabel("Token")
        plt.savefig(path)
        plt.close()

    for idx, feat in enumerate(fc):
        heat(np.asarray(feat[0]).mean(-1), f"Feature Maps {idx + 1}",
             os.path.join(out_dir, f"attention_c_{idx}.png"))
    for idx, feat in enumerate(fs):
        heat(np.asarray(feat[0]).mean(-1), f"Feature Maps {idx + 1}",
             os.path.join(out_dir, f"attention_s_{idx}.png"))

    def per_head(feat_map, tag):
        a = np.asarray(feat_map[0])  # (H, W, C)
        hd = a.shape[-1] // num_heads
        for h in range(num_heads):
            heat(a[..., h * hd:(h + 1) * hd].mean(-1),
                 f"{tag} - Head {h + 1}",
                 os.path.join(out_dir, f"{tag}_head_{h + 1}.png"))

    per_head(fcs, "fcs")
    per_head(fc[-1], "fc")
    per_head(fs[-1], "fs")


def make_diagnostic_fn(models: Dict, dtype=jnp.float32):
    """Jitted forward returning (fc, fs, fcs, cs) for analysis dumps."""

    @jax.jit
    def fn(params, content, style):
        fc = models["vit_c"].apply({"params": params["vit_c"]},
                                   content.astype(dtype))
        fs = models["vit_s"].apply({"params": params["vit_s"]},
                                   style.astype(dtype))
        fcs, cs = models["adaFormer"].apply(
            {"params": params["adaFormer"]}, fc, fs
        )
        return fc, fs, fcs, jnp.clip(cs.astype(jnp.float32), 0, 255)

    return fn


def main(argv=None):
    from ..train.train_image import build_models

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--content", required=True)
    ap.add_argument("--style", required=True)
    ap.add_argument("--out", default="./results/stylized.png")
    ap.add_argument("--size", type=int, nargs=2, default=(512, 512))
    ap.add_argument("--ada", help=".pth or orbax AdaFormer checkpoint")
    ap.add_argument("--vitc")
    ap.add_argument("--vits")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--attn-mode", default=None,
                    choices=["spatial", "batch_coupled"],
                    help="default: batch_coupled when loading .pth weights")
    ap.add_argument("--heatmaps", metavar="DIR",
                    help="save feature/head heatmaps (infer_image.py:97-184)")
    args = ap.parse_args(argv)

    import os

    attn_mode = args.attn_mode or default_attn_mode(args.ada)
    cfg = ModelConfig(attn_mode=attn_mode)
    models = build_models(cfg)
    if args.ada:
        params = load_ckpt_params(args.ada, args.vitc, args.vits)
    else:
        print("WARNING: no checkpoint given — random weights (smoke mode)")
        params = init_inference_params(
            models, jax.random.PRNGKey(0), tuple(args.size)
        )

    c = load_image(args.content, tuple(args.size))
    s = load_image(args.style, tuple(args.size))
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    if args.heatmaps:
        fn = make_diagnostic_fn(models, dtype)
        fc, fs, fcs, cs = fn(
            params, jnp.asarray(c)[None], jnp.asarray(s)[None]
        )
        out = np.asarray(cs[0])
        save_feature_heatmaps(
            fc, fs, fcs, args.heatmaps,
            num_heads=models["adaFormer"].num_heads,
        )
        print(f"heatmaps -> {args.heatmaps}")
    else:
        out = stylize_image(params, models, c, s, dtype)
    save_image(args.out, out)
    print(f"saved {args.out}  range=[{out.min():.1f}, {out.max():.1f}]")


if __name__ == "__main__":
    main()
