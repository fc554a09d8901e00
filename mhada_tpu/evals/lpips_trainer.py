"""LPIPS 2AFC training (functional port of the vendored lpips/trainer.py).

Trains the per-layer linear heads (clamped >= 0 after each step,
trainer.py:104-107) with a BCE ranking loss through a Dist2LogitLayer
(lpips/lpips.py:196-236): logit = MLP([d0, d1, d0-d1, d0/(d1+eps),
d1/(d0+eps)]), target = (judge + 1) / 2.  Optimiser: Adam(lr=1e-4,
betas=(0.5, 0.999)) (trainer.py:21,71).

The trunk (vgg16) stays frozen; a 2AFC sample is (ref, p0, p1, judge in
[0,1]) where judge is the fraction of humans preferring p1.
"""

from typing import Dict, List, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .lpips import VGG16Features, LPIPS_CHANNELS, _unit_normalize, _SHIFT, _SCALE


class LPIPSTrainState(NamedTuple):
    lin_weights: List[jnp.ndarray]   # per-layer (C,) head weights, >= 0
    logit_params: Dict               # Dist2LogitLayer params
    opt_state: optax.OptState


def init_logit_params(rng, chn_mid: int = 32) -> Dict:
    k1, k2, k3 = jax.random.split(rng, 3)

    def conv(k, cin, cout):
        return {
            "w": jax.random.uniform(k, (cin, cout), jnp.float32,
                                    -1 / cin**0.5, 1 / cin**0.5),
            "b": jnp.zeros((cout,)),
        }

    return {
        "l1": conv(k1, 5, chn_mid),
        "l2": conv(k2, chn_mid, chn_mid),
        "l3": conv(k3, chn_mid, 1),
    }


def dist2logit(params: Dict, d0, d1, eps: float = 0.1):
    """(..., 1) sigmoid probability that p1 is closer (lpips.py:196-224)."""
    x = jnp.stack(
        [d0, d1, d0 - d1, d0 / (d1 + eps), d1 / (d0 + eps)], axis=-1
    )

    def lrelu(v):
        return jnp.where(v >= 0, v, 0.2 * v)

    h = lrelu(x @ params["l1"]["w"] + params["l1"]["b"])
    h = lrelu(h @ params["l2"]["w"] + params["l2"]["b"])
    h = h @ params["l3"]["w"] + params["l3"]["b"]
    return jax.nn.sigmoid(h[..., 0])


def make_lpips_trainer(vgg_params: Dict, lr: float = 1e-4, beta1: float = 0.5):
    """Returns (init_state, train_step, distance_fn)."""
    model = VGG16Features()
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    tx = optax.adam(lr, b1=beta1, b2=0.999)

    def feats(img):
        x = img / (255.0 / 2.0) - 1.0
        x = (x - shift) / scale
        return model.apply({"params": vgg_params}, x)

    def distance(lin_weights, img0, img1):
        f0 = feats(img0)
        f1 = feats(img1)
        val = 0.0
        for t0, t1, w in zip(f0, f1, lin_weights):
            d = jnp.square(_unit_normalize(t0) - _unit_normalize(t1))
            val += jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
        return val

    def init_state(rng) -> LPIPSTrainState:
        lins = [
            jnp.full((c,), 1.0 / c, jnp.float32) for c in LPIPS_CHANNELS
        ]
        logit = init_logit_params(rng)
        return LPIPSTrainState(
            lins, logit, tx.init((lins, logit))
        )

    @jax.jit
    def train_step(state: LPIPSTrainState, ref, p0, p1, judge):
        """ref/p0/p1: (B, H, W, 3) 0-255; judge: (B,) in [0, 1]."""

        def loss_fn(trainable):
            lins, logit = trainable
            d0 = distance(lins, ref, p0)
            d1 = distance(lins, ref, p1)
            prob = dist2logit(logit, d0, d1)
            target = judge  # = (judge*2-1 + 1)/2 in the reference's [-1,1]
            bce = -(target * jnp.log(prob + 1e-12)
                    + (1 - target) * jnp.log(1 - prob + 1e-12))
            return jnp.mean(bce), (d0, d1)

        (loss, (d0, d1)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (state.lin_weights, state.logit_params)
        )
        updates, opt_state = tx.update(grads, state.opt_state)
        lins, logit = optax.apply_updates(
            (state.lin_weights, state.logit_params), updates
        )
        # clamp_weights (trainer.py:104-107)
        lins = [jnp.clip(w, min=0.0) for w in lins]
        # 2AFC accuracy: d1 < d0 should match judge > 0.5
        acc = jnp.mean(((d1 < d0) == (judge > 0.5)).astype(jnp.float32))
        return LPIPSTrainState(lins, logit, opt_state), {
            "loss": loss, "acc": acc,
        }

    return init_state, train_step, distance
