"""Full contents x styles grid stylization (reference infer_image_all.py).

Stylises every image in ``--contents`` against every image in ``--styles``
and writes ``results/content_{i}_style_{j}.jpg``.  TPU-first difference from
the reference's sequential B=1 loop: styles are pre-encoded once each, and
contents stream through a single jitted forward with the style features
swapped — identical outputs, far less recompute.
"""

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.image_io import load_image, save_image, list_files, mkdir


def run_grid(
    params,
    models,
    content_paths,
    style_paths,
    out_dir: str,
    image_size=(512, 512),
    dtype=jnp.float32,
):
    from .image import make_encode_style_fn, make_stylize_with_fs_fn

    mkdir(out_dir)
    encode = make_encode_style_fn(models, dtype)
    stylize = make_stylize_with_fs_fn(models, dtype)
    for j, sp in enumerate(style_paths):
        s = jnp.asarray(load_image(sp, image_size))[None]
        fs = encode(params, s)
        for i, cp in enumerate(content_paths):
            c = jnp.asarray(load_image(cp, image_size))[None]
            cs = np.asarray(stylize(params, c, fs)[0])
            save_image(
                os.path.join(out_dir, f"content_{i}_style_{j}.jpg"), cs
            )


def main(argv=None):
    from ..config import ModelConfig
    from ..train.train_image import build_models
    from .image import init_inference_params, load_ckpt_params, default_attn_mode

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--contents", default="/root/reference/MHAdaSTr/contents")
    ap.add_argument("--styles", default="/root/reference/MHAdaSTr/styles")
    ap.add_argument("--out", default="./results")
    ap.add_argument("--size", type=int, nargs=2, default=(512, 512))
    ap.add_argument("--ada")
    ap.add_argument("--vitc")
    ap.add_argument("--vits")
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    args = ap.parse_args(argv)

    models = build_models(
        ModelConfig(attn_mode=default_attn_mode(args.ada))
    )
    if args.ada:
        params = load_ckpt_params(args.ada, args.vitc, args.vits)
    else:
        print("WARNING: random weights (smoke mode)")
        params = init_inference_params(models, jax.random.PRNGKey(0))
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    run_grid(
        params, models, list_files(args.contents), list_files(args.styles),
        args.out, tuple(args.size), dtype,
    )
    print(f"grid written to {args.out}")


if __name__ == "__main__":
    main()
