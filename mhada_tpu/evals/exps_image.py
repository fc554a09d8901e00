"""Fixed-pair image quality sweep (reference exps_image.py).

Stylises the 6 canonical content/style pairs at 512^2, saves per-pair
content/style/stylized PNGs, computes the 12 metrics against content and
style, and writes ``results.csv`` with the exact reference schema
(exps_image.py:110-170), including the trailing average row.

Metrics that need pretrained backbone weights (LPIPS: vgg16+heads, SIFID:
inception, gram: vgg19) gate on the weight files being provided and emit
NaN otherwise, so the harness runs everywhere.
"""

import argparse
import csv
import math
import os
from typing import Dict, List, Optional

import numpy as np
import jax

from . import metrics
from ..utils.image_io import load_image, save_image, mkdir

CONTENT_STYLE_PAIR = [
    ("contents/Cornell.jpg", "styles/Untitled-1964.jpg"),
    ("contents/Bird.jpg", "styles/Sketch.jpg"),
    ("contents/RiverBoat.jpg", "styles/Blue-3.jpg"),
    ("contents/Sailboat.jpg", "styles/Another-colorful-world.jpg"),
    ("contents/Streets.jpg", "styles/Composition.jpg"),
    ("contents/Tubingen.jpg", "styles/Volga-Landscape.jpg"),
]

FIELDNAMES = [
    "content", "style", "lpips_content", "ssim_content", "sifid_content",
    "kl_c", "lpips_style", "ssim_style", "sifid_style", "kl_s", "gram",
    "moment", "uniformity", "entropy",
]


class MetricSuite:
    """All 12 exps_image metrics with optional pretrained backbones."""

    def __init__(
        self,
        vgg19_pth: Optional[str] = None,
        vgg16_pth: Optional[str] = None,
        lpips_heads_pth: Optional[str] = None,
        inception_pth: Optional[str] = None,
        sifid_dims: int = 2048,
    ):
        self.vgg_apply = None
        if vgg19_pth:
            from ..interop import load_pth, import_vgg19
            from ..models import VGG19Features

            params = import_vgg19(load_pth(vgg19_pth))
            model = VGG19Features()
            self.vgg_apply = jax.jit(
                lambda x: model.apply({"params": params}, x)
            )
        self.lpips_fn = None
        if vgg16_pth and lpips_heads_pth:
            from .lpips import load_lpips_params, make_lpips_fn

            self.lpips_fn = make_lpips_fn(
                *load_lpips_params(vgg16_pth, lpips_heads_pth)
            )
        self.sifid_ev = None
        if inception_pth:
            from ..interop import load_pth
            from .inception import import_inception
            from .sifid import SIFID

            self.sifid_ev = SIFID(
                import_inception(load_pth(inception_pth)), sifid_dims
            )

    def lpips(self, p0, p1) -> float:
        if self.lpips_fn is None:
            return math.nan
        import jax.numpy as jnp
        import cv2

        a = cv2.imread(p0)[:, :, ::-1].astype(np.float32)
        b = cv2.imread(p1)[:, :, ::-1].astype(np.float32)
        return float(self.lpips_fn(jnp.asarray(a)[None], jnp.asarray(b)[None])[0])

    def sifid(self, p0, p1) -> float:
        return self.sifid_ev(p0, p1) if self.sifid_ev else math.nan

    def gram(self, p0, p1) -> float:
        if self.vgg_apply is None:
            return math.nan
        return metrics.gram_loss(p0, p1, self.vgg_apply)

    def evaluate_pair(self, stylized, content, style) -> Dict[str, float]:
        """12 metrics for one stylised output (exps_image.py:92-146 order)."""
        return {
            "lpips_content": self.lpips(stylized, content),
            "ssim_content": metrics.ssim(stylized, content),
            "sifid_content": self.sifid(stylized, content),
            "kl_c": metrics.kl_divergence(stylized, content),
            "lpips_style": self.lpips(stylized, style),
            "ssim_style": metrics.ssim(stylized, style),
            "sifid_style": self.sifid(stylized, style),
            "kl_s": metrics.kl_divergence(stylized, style),
            "gram": self.gram(stylized, style),
            "moment": metrics.nth_order_moment(stylized),
            "uniformity": metrics.uniformity(stylized),
            "entropy": metrics.average_entropy(stylized),
        }


def write_results_csv(path: str, rows: List[Dict]) -> None:
    """Append the average row and write the reference CSV schema."""
    avg = {
        k: float(np.mean([r[k] for r in rows]))
        for k in FIELDNAMES[2:]
    }
    rows = rows + [{"content": "average", "style": "average", **avg}]
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FIELDNAMES)
        w.writeheader()
        for r in rows:
            w.writerow(r)


def run(
    params,
    models,
    suite: MetricSuite,
    assets_dir: str,
    results_dir: str = "./results",
    pairs=CONTENT_STYLE_PAIR,
    image_size=(512, 512),
    dtype=None,
) -> List[Dict]:
    import jax.numpy as jnp
    from ..infer.image import make_stylize_fn

    stylize = make_stylize_fn(models, dtype or jnp.float32)
    rows = []
    for i, (cpath, spath) in enumerate(pairs):
        c = load_image(os.path.join(assets_dir, cpath), image_size)
        s = load_image(os.path.join(assets_dir, spath), image_size)
        cs = np.asarray(
            stylize(params, jnp.asarray(c)[None], jnp.asarray(s)[None])[0]
        )
        save_path = os.path.join(results_dir, str(i + 1))
        mkdir(save_path, delete_existing_files=True)
        cp = os.path.join(save_path, "content.png")
        sp = os.path.join(save_path, "style.png")
        zp = os.path.join(save_path, "stylized.png")
        save_image(cp, c)
        save_image(sp, s)
        save_image(zp, cs)
        rows.append(
            {"content": cpath, "style": spath, **suite.evaluate_pair(zp, cp, sp)}
        )
    write_results_csv(os.path.join(results_dir, "results.csv"), rows)
    return rows


def main(argv=None):
    from ..config import ModelConfig
    from ..train.train_image import build_models
    from ..infer.image import init_inference_params, load_ckpt_params, default_attn_mode

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--assets", default="/root/reference/MHAdaSTr",
                    help="dir containing contents/ and styles/")
    ap.add_argument("--results", default="./results")
    ap.add_argument("--ada")
    ap.add_argument("--vitc")
    ap.add_argument("--vits")
    ap.add_argument("--vgg19")
    ap.add_argument("--vgg16")
    ap.add_argument("--lpips-heads")
    ap.add_argument("--inception")
    ap.add_argument("--size", type=int, nargs=2, default=(512, 512))
    args = ap.parse_args(argv)

    attn = default_attn_mode(args.ada)
    models = build_models(ModelConfig(attn_mode=attn))
    if args.ada:
        params = load_ckpt_params(args.ada, args.vitc, args.vits)
    else:
        print("WARNING: random weights (smoke mode)")
        params = init_inference_params(
            models, jax.random.PRNGKey(0), tuple(args.size)
        )
    suite = MetricSuite(args.vgg19, args.vgg16, args.lpips_heads, args.inception)
    rows = run(params, models, suite, args.assets, args.results,
               image_size=tuple(args.size))
    print(f"wrote {os.path.join(args.results, 'results.csv')} "
          f"({len(rows)} pairs + average)")


if __name__ == "__main__":
    main()
