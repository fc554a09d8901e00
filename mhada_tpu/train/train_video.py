"""Video training: reference train_video.py:35-219 as one jitted step.

Continues from the image checkpoint (epochs 21-30).  Per step: stylise both
content frames with one shared style encoding; identity passes; six losses
including flow-warped output- and feature-level temporal consistency.  The
reference evaluates VGG on c1/c2/style under no_grad (train_video.py:125-128)
— in JAX, gradients simply don't flow into constants, so this is automatic
(VGG is frozen either way).
"""

import jax
import jax.numpy as jnp
import optax

from ..config import VideoTrainConfig
from .train_image import TrainState, build_models, make_optimizer
from . import losses as L


def video_loss_fn(params, vgg_params, style, c1, c2, flow, mask, models, cfg):
    """The full video objective (reference train_video.py:110-167).

    style: (B, Hs, Ws, 3); c1/c2: (B, H, W, 3); flow: (B, H, W, 2) pixel flow
    into the past (frame2 -> frame1); mask: (B, H, W) validity.
    """
    if getattr(cfg, "compute_dtype", "float32") == "bfloat16":
        from .train_image import _cast_tree
        import jax.numpy as jnp

        params = _cast_tree(params, jnp.bfloat16)
        vgg_params = _cast_tree(vgg_params, jnp.bfloat16)
        style, c1, c2 = (x.astype(jnp.bfloat16) for x in (style, c1, c2))
    vit_c, vit_s, ada, vgg = (
        models["vit_c"], models["vit_s"], models["adaFormer"], models["vgg19"]
    )
    pc, ps, pa = params["vit_c"], params["vit_s"], params["adaFormer"]

    vitc_fc1 = vit_c.apply({"params": pc}, c1)
    vitc_fc2 = vit_c.apply({"params": pc}, c2)
    vits_fs = vit_s.apply({"params": ps}, style)
    ada_fcs1, cs1 = ada.apply({"params": pa}, vitc_fc1, vits_fs)
    ada_fcs2, cs2 = ada.apply({"params": pa}, vitc_fc2, vits_fs)

    vits_fc1 = vit_s.apply({"params": ps}, c1)
    vits_fc2 = vit_s.apply({"params": ps}, c2)
    vitc_fs = vit_c.apply({"params": pc}, style)
    _, cc1 = ada.apply({"params": pa}, vitc_fc1, vits_fc1)
    _, cc2 = ada.apply({"params": pa}, vitc_fc2, vits_fc2)
    _, ss = ada.apply({"params": pa}, vitc_fs, vits_fs)

    vgg_of = lambda x: vgg.apply({"params": vgg_params}, x)
    vgg_fc1 = vgg_of(jax.lax.stop_gradient(c1))
    vgg_fc2 = vgg_of(jax.lax.stop_gradient(c2))
    vgg_fs = vgg_of(jax.lax.stop_gradient(style))
    vgg_fcs1 = vgg_of(cs1)
    vgg_fcs2 = vgg_of(cs2)
    vgg_fcc1 = vgg_of(cc1)
    vgg_fcc2 = vgg_of(cc2)
    vgg_fss = vgg_of(ss)

    act = cfg.model.activation
    loss_gs = (
        L.global_style_loss(vgg_fcs1, vgg_fs)
        + L.global_style_loss(vgg_fcs2, vgg_fs)
    ) * cfg.lambda_gs
    loss_lf = (
        L.local_feature_loss(vgg_fc1, vgg_fs, vgg_fcs1, act)
        + L.local_feature_loss(vgg_fc2, vgg_fs, vgg_fcs2, act)
    ) * cfg.lambda_lf
    loss_ot = (
        L.output_level_temporal_loss(c1, c2, cs1, cs2, flow, mask)
        * cfg.lambda_ot
    )
    loss_ft = (
        L.feature_level_temporal_loss(ada_fcs1, ada_fcs2, flow, mask)
        * cfg.lambda_ft
    )
    loss_id1 = (
        L.mse(cc1, c1) + L.mse(cc2, c2) + L.mse(ss, style)
    ) * cfg.lambda_id1
    loss_id2 = 0.0
    for name in ("relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1"):
        loss_id2 += L.mse(vgg_fcc1[name], vgg_fc1[name])
        loss_id2 += L.mse(vgg_fcc2[name], vgg_fc2[name])
        loss_id2 += L.mse(vgg_fss[name], vgg_fs[name])
    loss_id2 = loss_id2 * cfg.lambda_id2

    loss = loss_gs + loss_lf + loss_ot + loss_ft + loss_id1 + loss_id2
    metrics = {
        "loss": loss, "l_gs": loss_gs, "l_lf": loss_lf, "l_ot": loss_ot,
        "l_ft": loss_ft, "l_id1": loss_id1, "l_id2": loss_id2,
    }
    return loss, metrics


def make_video_train_step(cfg: VideoTrainConfig, models=None, donate: bool = True):
    """Returns jitted ``step(state, vgg_params, style, c1, c2, flow, mask)``."""
    models = models or build_models(cfg, for_training=True)
    tx = make_optimizer(cfg)

    def step(state: TrainState, vgg_params, style, c1, c2, flow, mask):
        # image batches may arrive as uint8 (run_video ships them that
        # way — lossless, quarter H2D bytes); compute starts from float32
        style = style.astype(jnp.float32)
        c1 = c1.astype(jnp.float32)
        c2 = c2.astype(jnp.float32)
        (loss, metrics), grads = jax.value_and_grad(video_loss_fn, has_aux=True)(
            state.params, vgg_params, style, c1, c2, flow, mask, models, cfg
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())
