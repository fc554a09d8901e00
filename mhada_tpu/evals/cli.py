"""Unified metric CLI (reference eval.py:311-339).

Usage:
  python -m mhada_tpu.evals.cli -m MODE -p0 PATH0 -p1 PATH1 [weights flags]

Modes: lpips | ssim | kl | gram | moment | uni | entropy | sifid | debug_sifid
(same set as the reference; lpips/gram/sifid need the corresponding backbone
.pth weights).
"""

import argparse

from . import metrics


def main(argv=None):
    ap = argparse.ArgumentParser(
        usage="cli.py [-h] [-m MODE] [-p0 PATH0] [-p1 PATH1] [weights]",
    )
    ap.add_argument("-m", "--mode", default="lpips")
    ap.add_argument("-p0", "--path0", default="./results/stylized.png")
    ap.add_argument("-p1", "--path1", default="./results/style.png")
    ap.add_argument("--vgg19", help="torchvision VGG19 .pth (gram)")
    ap.add_argument("--vgg16", help="torchvision vgg16 .pth (lpips)")
    ap.add_argument("--lpips-heads", help="LPIPS v0.1 linear heads .pth")
    ap.add_argument("--inception", help="torchvision inception_v3 .pth (sifid)")
    opt = ap.parse_args(argv)

    if opt.mode == "lpips":
        from .lpips import lpips_distance

        assert opt.vgg16 and opt.lpips_heads, "--vgg16/--lpips-heads required"
        print("Distance: %f" % lpips_distance(
            opt.path0, opt.path1, opt.vgg16, opt.lpips_heads))
    elif opt.mode == "ssim":
        print("SSIM: %f" % metrics.ssim(opt.path0, opt.path1))
    elif opt.mode == "kl":
        print("KL: %f" % metrics.kl_divergence(opt.path0, opt.path1))
    elif opt.mode == "gram":
        import jax

        from ..interop import load_pth, import_vgg19
        from ..models import VGG19Features

        assert opt.vgg19, "--vgg19 required"
        model = VGG19Features()
        params = import_vgg19(load_pth(opt.vgg19))
        apply = jax.jit(lambda x: model.apply({"params": params}, x))
        print("Gram Loss: %f" % metrics.gram_loss(opt.path0, opt.path1, apply))
    elif opt.mode == "moment":
        print("Nth Order Moment: %f" % metrics.nth_order_moment(opt.path0))
    elif opt.mode == "uni":
        print("Uniformity: %f" % metrics.uniformity(opt.path0))
    elif opt.mode == "entropy":
        print("Average Entropy: %f" % metrics.average_entropy(opt.path0))
    elif opt.mode in ("sifid", "debug_sifid"):
        from ..interop import load_pth
        from .inception import import_inception
        from .sifid import SIFID

        assert opt.inception, "--inception required"
        sd = import_inception(load_pth(opt.inception))
        if opt.mode == "sifid":
            print("SIFID: %f" % SIFID(sd, 2048)(opt.path0, opt.path1))
        else:
            for dims in (64, 192, 768, 2048):
                v = SIFID(sd, dims)(opt.path0, opt.path1)
                print(f"SIFID with {dims}D: {v:.6f}")
    else:
        raise SystemExit(f"unknown mode: {opt.mode}")


if __name__ == "__main__":
    main()
