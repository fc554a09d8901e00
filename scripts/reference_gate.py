"""The standing reference-checkpoint acceptance gate (VERDICT r3 #6).

The end-to-end acceptance criterion (BASELINE.json) is LPIPS <= 1e-3 between
our stylizations and the reference implementation's, using the reference's
own trained checkpoint triple.  Those artifacts are unobtainable in this
sandbox (the reference gitignores ``models/`` and egress is zero, so even
the LPIPS metric's vgg16 trunk can't be fetched) — this script makes the
gate ONE ARTIFACT-DROP away: the moment someone supplies the .pth files it
runs the full protocol with a single command.

Protocol (mirrors /root/reference/MHAdaSTr/exps_image.py:26-33,42-75):

1. import the checkpoint triple (torch-free .pth reader, interop/);
2. stylize the 6 fixed exps_image content/style pairs at 512^2 with the
   batch-coupled attention quirk (the trained weights encode it);
3. compare against the reference implementation's saved stylizations with
   LPIPS (vgg16 trunk + v0.1 linear heads), assert <= 1e-3 per pair.

Usage (the real gate):

    python scripts/reference_gate.py \
        --ada AdaFormer_epoch_20_batchSize_8.pth \
        --vitc ViT_C_epoch_20_batchSize_8.pth \
        --vits ViT_S_epoch_20_batchSize_8.pth \
        --ref-outputs DIR      # reference stylized_{i}.png for the 6 pairs \
        --vgg16 vgg16.pth --heads lpips_vgg.pth

Smoke mode (no artifacts needed — validates the script mechanics end to
end, exercised by tests/test_drivers.py):

    python scripts/reference_gate.py --smoke

Smoke seeds random weights, round-trips them through interop/torch_export
-> .pth -> the same import path the real gate uses, stylizes with both the
round-tripped and the original params, and gates max |pixel delta| <=
0.1/255 — the same surrogate bound as tests/test_e2e_parity.py, which is
strictly stronger than the LPIPS bound.  Without --vgg16/--heads the real
gate also falls back to this pixel bound when --ref-outputs contains our
own outputs; LPIPS needs the metric weights.
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DIR = "/root/reference/MHAdaSTr"
# the 6 fixed pairs, exps_image.py:26-33
PAIRS = [
    ("Cornell.jpg", "Untitled-1964.jpg"),
    ("Bird.jpg", "Sketch.jpg"),
    ("RiverBoat.jpg", "Blue-3.jpg"),
    ("Sailboat.jpg", "Another-colorful-world.jpg"),
    ("Streets.jpg", "Composition.jpg"),
    ("Tubingen.jpg", "Volga-Landscape.jpg"),
]
SIZE = (512, 512)  # exps_image.py:14
LPIPS_BOUND = 1e-3  # BASELINE.json acceptance
PIXEL_BOUND = 0.1 / 255.0  # the surrogate (tests/test_e2e_parity.py:70)


def stylize_pairs(params, models, out_dir, assets_dir, dtype):
    """Stylize the 6 pairs, save stylized_{i}.png; returns the arrays."""
    import jax.numpy as jnp

    from mhada_tpu.infer.image import make_stylize_fn
    from mhada_tpu.utils.image_io import load_image, save_image

    fn = make_stylize_fn(models, dtype=dtype)
    os.makedirs(out_dir, exist_ok=True)
    outs = []
    for i, (c_name, s_name) in enumerate(PAIRS):
        c = load_image(os.path.join(assets_dir, "contents", c_name), SIZE)
        s = load_image(os.path.join(assets_dir, "styles", s_name), SIZE)
        cs = np.asarray(fn(params, jnp.asarray(c)[None], jnp.asarray(s)[None])[0])
        save_image(os.path.join(out_dir, f"stylized_{i}.png"), cs)
        outs.append(cs)
        print(f"  pair {i}: {c_name} x {s_name} -> stylized_{i}.png")
    return outs


def run_gate(args):
    from mhada_tpu.config import ModelConfig
    from mhada_tpu.infer.image import load_pth_params
    from mhada_tpu.train.train_image import build_models
    import jax.numpy as jnp

    # trained reference weights encode the batch-axis attention quirk
    models = build_models(ModelConfig(attn_mode="batch_coupled"))
    params = load_pth_params(args.ada, args.vitc, args.vits)
    out_dir = args.out or os.path.join(tempfile.mkdtemp(prefix="refgate_"),
                                       "ours")
    print(f"stylizing the 6 exps_image pairs -> {out_dir}")
    ours = stylize_pairs(params, models, out_dir, args.assets,
                         jnp.bfloat16 if args.dtype == "bfloat16"
                         else jnp.float32)

    failures = []
    if args.vgg16 and args.heads:
        from mhada_tpu.evals.lpips import lpips_distance

        for i in range(len(PAIRS)):
            ref_png = os.path.join(args.ref_outputs, f"stylized_{i}.png")
            d = lpips_distance(os.path.join(out_dir, f"stylized_{i}.png"),
                               ref_png, args.vgg16, args.heads)
            ok = d <= LPIPS_BOUND
            print(f"  pair {i}: LPIPS={d:.2e} "
                  f"({'OK' if ok else f'FAIL > {LPIPS_BOUND}'})")
            if not ok:
                failures.append(i)
    else:
        print("no --vgg16/--heads: falling back to the pixel-error "
              "surrogate (strictly stronger than the LPIPS bound)")
        from PIL import Image

        for i, cs in enumerate(ours):
            ref_png = os.path.join(args.ref_outputs, f"stylized_{i}.png")
            ref = np.asarray(Image.open(ref_png).convert("RGB"), np.float32)
            err = np.abs(cs - ref).max() / 255.0
            ok = err <= PIXEL_BOUND
            print(f"  pair {i}: max|delta|={err:.2e} "
                  f"({'OK' if ok else f'FAIL > {PIXEL_BOUND}'})")
            if not ok:
                failures.append(i)
    if failures:
        raise SystemExit(f"reference gate FAILED on pairs {failures}")
    print("reference gate PASSED")


def run_smoke(args):
    """Round-trip seeded weights through .pth export -> the gate's import
    path, and bound the pixel delta of the two stylizations."""
    import jax
    import jax.numpy as jnp

    from mhada_tpu.config import ModelConfig
    from mhada_tpu.infer.image import (
        init_inference_params, load_pth_params, make_stylize_fn,
    )
    from mhada_tpu.interop.torch_export import (
        export_adaformer, export_vit, save_pth,
    )
    from mhada_tpu.train.train_image import build_models
    from mhada_tpu.utils.image_io import load_image

    models = build_models(ModelConfig(attn_mode="batch_coupled"))
    params = init_inference_params(models, jax.random.PRNGKey(0))
    tmp = tempfile.mkdtemp(prefix="refgate_smoke_")
    paths = {k: os.path.join(tmp, f"{k}.pth")
             for k in ("ada", "vitc", "vits")}
    save_pth(paths["ada"], export_adaformer(params["adaFormer"]))
    save_pth(paths["vitc"], export_vit(params["vit_c"]))
    save_pth(paths["vits"], export_vit(params["vit_s"]))
    rt_params = load_pth_params(paths["ada"], paths["vitc"], paths["vits"])

    fn = make_stylize_fn(models)
    c = load_image(os.path.join(args.assets, "contents", PAIRS[0][0]),
                   (args.smoke_size, args.smoke_size))
    s = load_image(os.path.join(args.assets, "styles", PAIRS[0][1]),
                   (args.smoke_size, args.smoke_size))
    c, s = jnp.asarray(c)[None], jnp.asarray(s)[None]
    direct = np.asarray(fn(params, c, s))
    roundtrip = np.asarray(fn(rt_params, c, s))
    err = np.abs(direct - roundtrip).max() / 255.0
    print(f"smoke: export->import round-trip max|pixel delta| = {err:.2e} "
          f"(bound {PIXEL_BOUND:.2e})")
    assert err <= PIXEL_BOUND, err
    print("reference gate smoke PASSED")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ada", help="reference AdaFormer .pth")
    ap.add_argument("--vitc", help="reference ViT_C .pth")
    ap.add_argument("--vits", help="reference ViT_S .pth")
    ap.add_argument("--ref-outputs",
                    help="dir of the reference impl's stylized_{i}.png")
    ap.add_argument("--vgg16", help="torchvision vgg16 .pth (LPIPS trunk)")
    ap.add_argument("--heads", help="LPIPS v0.1 vgg linear-heads .pth")
    ap.add_argument("--assets", default=REF_DIR,
                    help="dir holding contents/ and styles/")
    ap.add_argument("--out", help="where to save our stylizations")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--smoke", action="store_true",
                    help="validate the script with seeded weights")
    ap.add_argument("--smoke-size", type=int, default=64)
    args = ap.parse_args(argv)

    if args.smoke:
        run_smoke(args)
        return
    missing = [k for k in ("ada", "vitc", "vits", "ref_outputs")
               if not getattr(args, k)]
    if missing:
        ap.error(f"real gate needs --{', --'.join(missing)} "
                 "(or use --smoke)")
    run_gate(args)


if __name__ == "__main__":
    main()
