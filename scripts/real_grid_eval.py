"""Weight-free exps metrics over the reference's REAL 20x47 demo JPEGs.

VERDICT r2 item 1b/2: the reference vendors 20 content + 47 style demo
photographs (reference infer_image_all.py:42-66 defaults to them;
exps_image.py:26-33 picks its canonical pairs from them).  This harness
stylises the FULL grid through the TPU inference path (style encoded once
per style, contents streamed — infer/image_all.py semantics) and computes
every metric computable without pretrained backbone weights
(reference eval.py modes ssim/kl/moment/uni/entropy) per pair, writing
``artifacts/real_grid_results.csv`` in the exact exps_image CSV schema
(reference exps_image.py:110-170, incl. the trailing average row; the
weight-needing columns lpips/sifid/gram are NaN — torchvision pretrained
trunks are not obtainable in this sandbox).

Weights are a seeded smoke initialisation (the reference ships no trained
checkpoint; models/ is gitignored upstream) with the decoder re-weighted
to gain-controlled identity+mixing kernels — raw random init attenuates
through the 9-conv ReLU chain to an all-black output (every metric
degenerate); the mixing weights keep outputs mid-range and
content-dependent, so the recorded metric distributions actually vary
per pair.  The artifact's value is the protocol run on real photographs:
real JPEG codec path, real pixel statistics, recorded metric
distributions.  Provenance is stamped into artifacts/real_grid_README.md.

Usage: python scripts/real_grid_eval.py [--limit-styles N] [--out DIR]
"""

import argparse
import csv
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference/MHAdaSTr"


def mixing_decoder_params(params, seed=7):
    """Identity-centre-tap + small mixing-noise decoder weights (the
    tests/test_sp.py trick): keeps outputs mid-range instead of the
    all-black raw-random-init result."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)

    def mix(leaf):
        a = np.asarray(leaf)
        if a.ndim == 4:  # (3, 3, ci, co) conv kernel
            ci, co = a.shape[2], a.shape[3]
            amp = 1.0 / (3.0 * np.sqrt(ci))
            k = rng.uniform(-amp, amp, a.shape).astype(np.float32)
            for o in range(co):
                k[1, 1, o % ci, o] += 1.0
            return jnp.asarray(k)
        return jnp.full_like(leaf, 0.05)  # bias

    params = dict(params)
    params["adaFormer"] = dict(params["adaFormer"])
    params["adaFormer"]["decoder"] = jax.tree_util.tree_map(
        mix, params["adaFormer"]["decoder"])
    return params
FIELDNAMES = [
    "content", "style", "lpips_content", "ssim_content", "sifid_content",
    "kl_c", "lpips_style", "ssim_style", "sifid_style", "kl_s", "gram",
    "moment", "uniformity", "entropy",
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="artifacts")
    ap.add_argument("--size", type=int, nargs=2, default=(512, 512))
    ap.add_argument("--limit-styles", type=int, default=0,
                    help="debug: first N styles only")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mhada_tpu.config import ModelConfig
    from mhada_tpu.evals import metrics
    from mhada_tpu.infer.image import (
        init_inference_params, make_encode_style_fn, make_stylize_with_fs_fn,
    )
    from mhada_tpu.train.train_image import build_models
    from mhada_tpu.utils.device import commit_to_device
    from mhada_tpu.utils.image_io import load_image, save_image, list_files, mkdir

    t_start = time.time()
    size = tuple(args.size)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    content_paths = list_files(os.path.join(REF, "contents"))
    style_paths = list_files(os.path.join(REF, "styles"))
    if args.limit_styles:
        style_paths = style_paths[: args.limit_styles]
    print(f"{len(content_paths)} contents x {len(style_paths)} styles @ {size}",
          file=sys.stderr)

    models = build_models(ModelConfig())
    params = mixing_decoder_params(
        init_inference_params(models, jax.random.PRNGKey(0), size))
    encode = make_encode_style_fn(models, dtype)
    stylize = make_stylize_with_fs_fn(models, dtype)

    out_dir = args.out
    img_dir = os.path.join(out_dir, "real_grid_images")
    mkdir(out_dir)
    mkdir(img_dir, delete_existing_files=True)

    # resized originals round-trip through the codec once, like
    # exps_image.run saving content.png/style.png before measuring
    c_disk, s_disk = [], []
    c_dev = []
    for i, p in enumerate(content_paths):
        img = load_image(p, size)
        dp = os.path.join(img_dir, f"content_{i}.png")
        save_image(dp, img)
        c_disk.append(dp)
        c_dev.append(commit_to_device(jnp.asarray(img)[None]))
    for j, p in enumerate(style_paths):
        img = load_image(p, size)
        dp = os.path.join(img_dir, f"style_{j}.png")
        save_image(dp, img)
        s_disk.append(dp)

    rows = []
    nan = math.nan
    for j, sp in enumerate(style_paths):
        s = jnp.asarray(load_image(sp, size))[None]
        fs = commit_to_device(encode(params, s))
        outs = [stylize(params, c, fs) for c in c_dev]  # queue all 20
        outs = [np.asarray(o[0]) for o in outs]
        for i, cs in enumerate(outs):
            zp = os.path.join(img_dir, f"stylized_c{i}_s{j}.jpg")
            save_image(zp, cs)
            cp, spd = c_disk[i], s_disk[j]
            rows.append({
                "content": os.path.basename(content_paths[i]),
                "style": os.path.basename(style_paths[j]),
                "lpips_content": nan,
                "ssim_content": metrics.ssim(zp, cp),
                "sifid_content": nan,
                "kl_c": metrics.kl_divergence(zp, cp),
                "lpips_style": nan,
                "ssim_style": metrics.ssim(zp, spd),
                "sifid_style": nan,
                "kl_s": metrics.kl_divergence(zp, spd),
                "gram": nan,
                "moment": metrics.nth_order_moment(zp),
                "uniformity": metrics.uniformity(zp),
                "entropy": metrics.average_entropy(zp),
            })
            os.remove(zp) if (i, j) not in ((0, 0), (5, 17)) else None
        print(f"style {j + 1}/{len(style_paths)} done "
              f"({time.time() - t_start:.0f}s)", file=sys.stderr)

    avg = {k: float(np.nanmean([r[k] for r in rows])) for k in FIELDNAMES[2:]}
    csv_path = os.path.join(out_dir, "real_grid_results.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FIELDNAMES)
        w.writeheader()
        for r in rows + [{"content": "average", "style": "average", **avg}]:
            w.writerow(r)

    with open(os.path.join(out_dir, "real_grid_README.md"), "w") as f:
        f.write(
            "# real_grid_results.csv\n\n"
            f"- grid: {len(content_paths)} contents x {len(style_paths)} "
            f"styles = {len(rows)} pairs, {size[0]}x{size[1]}, "
            f"dtype {args.dtype}\n"
            f"- inputs: the reference's bundled demo JPEGs "
            f"({REF}/contents, {REF}/styles — the only real photographs "
            "in the sandbox)\n"
            "- weights: seeded smoke init with gain-controlled mixing "
            "decoder kernels (upstream ships no trained checkpoint; "
            "models/ is gitignored there; raw random init attenuates to "
            "an all-black output) — metric values characterise the "
            "PROTOCOL on real images, not stylization quality\n"
            "- columns lpips/sifid/gram are NaN: they need torchvision "
            "pretrained trunks, not obtainable with zero egress\n"
            f"- backend: {jax.devices()[0].platform}, "
            f"runtime {time.time() - t_start:.0f}s\n"
            f"- schema: reference exps_image.py:110-170 incl. average row\n"
        )
    print(f"wrote {csv_path}: {len(rows)} pairs + average; "
          f"avg={ {k: round(v, 4) for k, v in avg.items()} }",
          file=sys.stderr)


if __name__ == "__main__":
    main()
