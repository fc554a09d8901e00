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

from typing import Callable, List

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
