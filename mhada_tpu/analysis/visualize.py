"""Feature-inversion visualisations (reference visual_vit.py, visual_mhada.py,
visual_cnn.py).

Optimise an image so its features match a target's — trivially expressed in
JAX as gradient descent through the jitted model wrt the input.  Reference
recipes: ViT — Adam lr 0.5, 3000 iters, MSE over the 3 block outputs
(visual_vit.py:88-120); MHAda — same against the pre-decoder fcs
(visual_mhada.py:111-137); VGG — progressive reconstruction over relu1..k
prefixes (visual_cnn.py:69-97, LBFGS in the reference; Adam here — XLA has
no LBFGS and the result is visual).
"""

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax


def normalize_per_channel(img: jnp.ndarray) -> np.ndarray:
    """Per-channel min-max -> [0,255] uint8 (visual_vit.py:104-113)."""
    x = np.asarray(img)
    out = np.zeros_like(x)
    for c in range(x.shape[-1]):
        ch = x[..., c]
        lo, hi = ch.min(), ch.max()
        out[..., c] = (ch - lo) / (hi - lo + 1e-8) * 255.0
    return out.astype(np.uint8)


def _invert(
    feature_fn: Callable,
    target_feats,
    shape,
    lr: float,
    iters: int,
    seed: int = 0,
    log_every: int = 500,
) -> np.ndarray:
    """Optimise an image whose features match ``target_feats``.

    The whole optimisation runs as one jitted lax.scan on device — no
    per-iteration host round-trips.
    """

    def loss_fn(img):
        feats = feature_fn(img)
        loss = 0.0
        for f, t in zip(feats, target_feats):
            loss += jnp.mean(jnp.square(f - t))
        return loss

    tx = optax.adam(lr)
    img0 = jax.random.uniform(jax.random.PRNGKey(seed), shape, jnp.float32,
                              0.0, 255.0)

    @jax.jit
    def run(img0):
        def step(carry, _):
            img, opt_state = carry
            loss, g = jax.value_and_grad(loss_fn)(img)
            updates, opt_state = tx.update(g, opt_state)
            return (optax.apply_updates(img, updates), opt_state), loss

        (img, _), losses = jax.lax.scan(
            step, (img0, tx.init(img0)), None, length=iters
        )
        return img, losses

    img, losses = run(img0)
    if log_every:
        ls = np.asarray(losses)
        for i in range(0, iters, log_every):
            print(f"  iter {i}: loss {ls[i]:.4f}")
    return np.asarray(img)


def invert_vit_features(
    vit_apply: Callable, target_img: jnp.ndarray,
    lr: float = 0.5, iters: int = 3000,
) -> np.ndarray:
    """visual_vit.py: match all 3 ViT block outputs of ``target_img``."""
    target = [jax.lax.stop_gradient(f) for f in vit_apply(target_img)]
    return _invert(vit_apply, target, target_img.shape, lr, iters)


def invert_mhada_features(
    fcs_fn: Callable, content: jnp.ndarray, style: jnp.ndarray,
    lr: float = 0.5, iters: int = 3000,
) -> np.ndarray:
    """visual_mhada.py: match the pre-decoder fcs of (content, style).

    ``fcs_fn(img)`` must return the fcs map for ``img`` as content with the
    fixed style (the decoder-less AdaFormer path, visual_mhada.py:43-75).
    """
    target = [jax.lax.stop_gradient(fcs_fn(content))]
    return _invert(lambda im: [fcs_fn(im)], target, content.shape, lr, iters)


def invert_vgg_features(
    vgg_apply: Callable, target_img: jnp.ndarray, last_layer: int,
    lr: float = 1.0, iters: int = 1000,
) -> np.ndarray:
    """visual_cnn.py: reconstruct from VGG relu1..k prefix features."""
    names = [f"relu{i}_1" for i in range(1, last_layer + 1)]

    def feats(img):
        d = vgg_apply(img)
        return [d[n] for n in names]

    target = [jax.lax.stop_gradient(f) for f in feats(target_img)]
    return _invert(feats, target, target_img.shape, lr, iters)


def main(argv=None):
    """CLI for the feature-inversion tools (reference visual_vit.py /
    visual_mhada.py / visual_cnn.py as one driver)."""
    import argparse

    import jax
    import jax.numpy as jnp

    from ..config import ModelConfig
    from ..train.train_image import build_models
    from ..infer.image import init_inference_params, load_pth_params
    from ..utils.image_io import load_image, save_image

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--mode", required=True, choices=["vit", "mhada", "vgg"])
    ap.add_argument("--target", required=True, help="target image")
    ap.add_argument("--style", help="style image (mhada mode)")
    ap.add_argument("--out", default="./results/inversion.png")
    ap.add_argument("--size", type=int, nargs=2, default=(256, 256))
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=0.5)
    ap.add_argument("--last-layer", type=int, default=3,
                    help="vgg mode: reconstruct from relu1..k")
    ap.add_argument("--ada")
    ap.add_argument("--vitc")
    ap.add_argument("--vits")
    ap.add_argument("--vgg19", help="torchvision VGG19 .pth (vgg mode)")
    args = ap.parse_args(argv)

    models = build_models(
        ModelConfig(attn_mode="batch_coupled" if args.ada else "spatial")
    )
    if args.ada:
        params = load_pth_params(args.ada, args.vitc, args.vits)
    else:
        print("WARNING: random weights (smoke mode)")
        params = init_inference_params(models, jax.random.PRNGKey(0))
    target = jnp.asarray(load_image(args.target, tuple(args.size)))[None]

    if args.mode == "vit":
        apply = lambda x: models["vit_c"].apply({"params": params["vit_c"]}, x)
        img = invert_vit_features(apply, target, args.lr, args.iters)
    elif args.mode == "mhada":
        assert args.style, "--style required for mhada mode"
        style = jnp.asarray(load_image(args.style, tuple(args.size)))[None]
        fs = models["vit_s"].apply({"params": params["vit_s"]}, style)

        def fcs_fn(img):
            fc = models["vit_c"].apply({"params": params["vit_c"]}, img)
            fcs, _ = models["adaFormer"].apply(
                {"params": params["adaFormer"]}, fc, fs
            )
            return fcs

        img = invert_mhada_features(fcs_fn, target, style, args.lr, args.iters)
    else:
        if args.vgg19:
            from ..interop import load_pth, import_vgg19

            vgg_params = import_vgg19(load_pth(args.vgg19))
        else:
            print("WARNING: random VGG weights")
            from ..models import VGG19Features

            vgg_params = VGG19Features().init(
                jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
            )["params"]
        from ..models import VGG19Features

        model = VGG19Features()
        apply = lambda x: model.apply({"params": vgg_params}, x)
        img = invert_vgg_features(apply, target, args.last_layer,
                                  args.lr, args.iters)

    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_image(args.out, normalize_per_channel(img[0]))
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
