"""Feature-inversion visualisations (reference visual_vit.py, visual_mhada.py,
visual_cnn.py).

Optimise an image so its features match a target's — trivially expressed in
JAX as gradient descent through the jitted model wrt the input.  Reference
recipes: ViT — Adam lr 0.5, 3000 iters, MSE over the 3 block outputs
(visual_vit.py:88-120); MHAda — same against the pre-decoder fcs
(visual_mhada.py:111-137); VGG — progressive LBFGS reconstruction over
relu1..k prefixes (visual_cnn.py:69-97; ``optax.lbfgs`` with zoom line
search here vs torch LBFGS's fixed lr=1 step — same quasi-Newton recipe,
each 150-step optimisation running as one jitted lax.scan; an Adam
fallback remains via ``invert_vgg_features``).
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


def _invert_lbfgs(feature_fn, target_feats, shape, iters, seed=0):
    """LBFGS feature inversion (reference visual_cnn.py:77-91 semantics:
    noise init, MSE sum over matched layers, 150 quasi-Newton steps)."""

    def loss_fn(img):
        feats = feature_fn(img)
        loss = 0.0
        for f, t in zip(feats, target_feats):
            loss += jnp.mean(jnp.square(f - t))
        return loss

    opt = optax.lbfgs(learning_rate=1.0)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)
    img0 = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)

    @jax.jit
    def run(img0):
        def step(carry, _):
            img, st = carry
            value, grad = value_and_grad(img, state=st)
            updates, st = opt.update(grad, st, img, value=value, grad=grad,
                                     value_fn=loss_fn)
            return (optax.apply_updates(img, updates), st), value

        (img, _), losses = jax.lax.scan(
            step, (img0, opt.init(img0)), None, length=iters
        )
        return img, losses

    img, losses = run(img0)
    return np.asarray(img), np.asarray(losses)


def progressive_vgg_reconstruction(
    vgg_apply, target_img01, iters: int = 150,
):
    """Reference visual_cnn.py:69-97: for k = 1..5 reconstruct a fresh
    noise image so its relu1_1..relu{k}_1 features match the target's.

    ``vgg_apply`` maps a [0, 1]-domain image to the 5-tap feature dict
    (the reference's local VGG19 normalises WITHOUT /255,
    visual_cnn.py:9-15).  target_img01: (1, H, W, 3) in [0, 1].
    Yields (name, image01, losses) 3-tuples — the prefix name, the
    reconstructed image clamped to [0, 1] (reference deprocess,
    visual_cnn.py:53-58), and the per-step loss trace.
    """
    all_layers = [f"relu{i}_1" for i in range(1, 6)]
    target = {k: jax.lax.stop_gradient(v)
              for k, v in vgg_apply(target_img01).items()}
    for k in range(1, len(all_layers) + 1):
        layers = all_layers[:k]

        def feats(img, layers=layers):
            d = vgg_apply(img)
            return [d[n] for n in layers]

        img, losses = _invert_lbfgs(
            feats, [target[n] for n in layers], target_img01.shape, iters,
            seed=k,
        )
        yield "_".join(layers), np.clip(img, 0.0, 1.0), losses


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
    from ..infer.image import init_inference_params, load_ckpt_params, default_attn_mode
    from ..utils.image_io import load_image, save_image

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--mode", required=True,
                    choices=["vit", "mhada", "vgg", "vgg_progressive"])
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

    # for_training=True: inversion takes jax.grad through the encoders, so
    # the forward-only token-major attention kernels (no VJP) must stay off —
    # the training build routes attention through the head-major flash
    # kernels, which have a custom VJP.
    models = build_models(
        ModelConfig(attn_mode=default_attn_mode(args.ada)),
        for_training=True,
    )
    if args.ada:
        params = load_ckpt_params(args.ada, args.vitc, args.vits)
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
        if args.mode == "vgg_progressive":
            # reference visual_cnn.py recipe: 224^2, [0,1] domain (its local
            # VGG19 normalises without /255 — feeding x*255 to our module
            # cancels its internal /255), LBFGS 150 steps per prefix.
            import os

            apply01 = lambda x: model.apply({"params": vgg_params}, x * 255.0)
            t01 = target / 255.0
            out_dir = os.path.dirname(args.out) or "./results"
            os.makedirs(out_dir, exist_ok=True)
            for name, img01, losses in progressive_vgg_reconstruction(
                apply01, t01, iters=min(args.iters, 150)
            ):
                path = os.path.join(out_dir, f"reconstructed_{name}.jpg")
                save_image(path, (img01[0] * 255.0).astype(np.uint8))
                print(f"saved {path} (final loss {losses[-1]:.4f})")
            return
        apply = lambda x: model.apply({"params": vgg_params}, x)
        img = invert_vgg_features(apply, target, args.last_layer,
                                  args.lr, args.iters)

    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_image(args.out, normalize_per_channel(img[0]))
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
