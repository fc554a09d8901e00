"""Full-grid quality sweep (reference exps_image_all.py).

Every content x every style (reference: 20x47) at 512^2, 9 metrics per pair
(no SIFID — too slow at grid scale), CSV with the reference schema
(exps_image_all.py:101-148) plus the average row.
"""

import argparse
import csv
import os
import tempfile
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from . import metrics
from .exps_image import MetricSuite
from ..utils.image_io import load_image, save_image, list_files, mkdir

FIELDNAMES = [
    "content", "style", "lpips_content", "ssim_content", "lpips_style",
    "ssim_style", "kl", "gram", "moment", "uniformity", "entropy",
]


def evaluate_grid_pair(suite: MetricSuite, stylized, content, style) -> Dict:
    return {
        "lpips_content": suite.lpips(stylized, content),
        "ssim_content": metrics.ssim(stylized, content),
        "lpips_style": suite.lpips(stylized, style),
        "ssim_style": metrics.ssim(stylized, style),
        "kl": metrics.kl_divergence(stylized, style),
        "gram": suite.gram(stylized, style),
        "moment": metrics.nth_order_moment(stylized),
        "uniformity": metrics.uniformity(stylized),
        "entropy": metrics.average_entropy(stylized),
    }


def run(
    params,
    models,
    suite: MetricSuite,
    content_paths: List[str],
    style_paths: List[str],
    results_dir: str = "./results",
    image_size=(512, 512),
    dtype=jnp.float32,
) -> List[Dict]:
    from ..infer.image import make_encode_style_fn, make_stylize_with_fs_fn

    mkdir(results_dir)
    encode = make_encode_style_fn(models, dtype)
    stylize = make_stylize_with_fs_fn(models, dtype)
    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        for j, sp in enumerate(style_paths):
            s = load_image(sp, image_size)
            fs = encode(params, jnp.asarray(s)[None])
            spath = os.path.join(tmp, "style.png")
            save_image(spath, s)
            for i, cp in enumerate(content_paths):
                c = load_image(cp, image_size)
                cs = np.asarray(stylize(params, jnp.asarray(c)[None], fs)[0])
                zpath = os.path.join(
                    results_dir, f"content_{i}_style_{j}.jpg"
                )
                save_image(zpath, cs)
                cpath = os.path.join(tmp, "content.png")
                save_image(cpath, c)
                rows.append({
                    "content": os.path.basename(cp),
                    "style": os.path.basename(sp),
                    **evaluate_grid_pair(suite, zpath, cpath, spath),
                })
    avg = {k: float(np.mean([r[k] for r in rows])) for k in FIELDNAMES[2:]}
    rows.append({"content": "average", "style": "average", **avg})
    with open(os.path.join(results_dir, "results_all.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FIELDNAMES)
        w.writeheader()
        for r in rows:
            w.writerow(r)
    return rows


def main(argv=None):
    from ..config import ModelConfig
    from ..train.train_image import build_models
    from ..infer.image import init_inference_params, load_ckpt_params, default_attn_mode

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--contents", default="/root/reference/MHAdaSTr/contents")
    ap.add_argument("--styles", default="/root/reference/MHAdaSTr/styles")
    ap.add_argument("--results", default="./results")
    ap.add_argument("--size", type=int, nargs=2, default=(512, 512))
    ap.add_argument("--ada")
    ap.add_argument("--vitc")
    ap.add_argument("--vits")
    ap.add_argument("--vgg19")
    ap.add_argument("--vgg16")
    ap.add_argument("--lpips-heads")
    args = ap.parse_args(argv)

    models = build_models(
        ModelConfig(attn_mode=default_attn_mode(args.ada))
    )
    if args.ada:
        params = load_ckpt_params(args.ada, args.vitc, args.vits)
    else:
        print("WARNING: random weights (smoke mode)")
        params = init_inference_params(models, jax.random.PRNGKey(0))
    suite = MetricSuite(args.vgg19, args.vgg16, args.lpips_heads)
    rows = run(params, models, suite, list_files(args.contents),
               list_files(args.styles), args.results, tuple(args.size))
    print(f"{len(rows) - 1} pairs -> {args.results}/results_all.csv")


if __name__ == "__main__":
    main()
