"""Image training: the reference recipe (train_image.py:31-186) as one jitted
SPMD train step.

Per step (reference train_image.py:103-144): stylise cs = AdaFormer(vit_c(c),
vit_s(s)); identity images cc, ss; five VGG sweeps; four losses (global-style,
local-feature, identity-1/2); one backward; Adam updates for the three
networks.  The reference's three per-network Adam optimizers share lr=1e-4, so
a single optax.adam over the combined {vit_c, vit_s, adaFormer} tree is
mathematically identical (Adam is per-leaf).

Data parallelism: the step is written for ``jax.jit`` with sharded batch
inputs over a ``Mesh(('data',))`` — see ``mhada_tpu.parallel``.
"""

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import ImageTrainConfig
from ..models import VisionTransformer, AdaFormer, VGG19Features
from . import losses as L


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def resolve_mhada_backend(backend: str, for_training: bool) -> bool:
    """'auto' -> fused Pallas kernel on TPU (inference AND training — the
    kernel has a custom VJP with an XLA-rematerialised backward); naive
    einsum on CPU (no Pallas compile path)."""
    del for_training  # kernel is differentiable since the custom VJP landed
    if backend == "pallas":
        return True
    if backend == "naive":
        return False
    return jax.default_backend() not in ("cpu",)


def build_models(cfg, for_training: bool = False) -> Dict[str, Any]:
    """cfg: anything with a ``.model`` ModelConfig, or a ModelConfig itself."""
    m = getattr(cfg, "model", cfg)
    use_pallas = resolve_mhada_backend(
        getattr(m, "mhada_backend", "auto"), for_training
    )
    fuse_ln_cfg = getattr(m, "fuse_ln", "auto")
    fuse_ln = use_pallas and (
        not for_training if fuse_ln_cfg == "auto" else bool(fuse_ln_cfg))
    if not use_pallas:
        packed_decoder = False
    elif not for_training:
        packed_decoder = "mega"
    elif getattr(m, "train_decoder", "auto") == "col":
        packed_decoder = "col"
    else:
        packed_decoder = "mega_train"
    return {
        # token-major attention (tokmaj) is forward-only — inference builds
        "vit_c": VisionTransformer(
            patch_size=m.patch_size, num_layers=m.num_layers,
            num_heads=m.num_heads, hidden_dim=m.hidden_dim,
            mlp_dim=m.mlp_dim, pos_embedding=True, attn_mode=m.attn_mode,
            use_pallas=use_pallas, tokmaj=not for_training,
            fuse_ln=fuse_ln,
        ),
        "vit_s": VisionTransformer(
            patch_size=m.patch_size, num_layers=m.num_layers,
            num_heads=m.num_heads, hidden_dim=m.hidden_dim,
            mlp_dim=m.mlp_dim, pos_embedding=False, attn_mode=m.attn_mode,
            use_pallas=use_pallas, tokmaj=not for_training,
            fuse_ln=fuse_ln,
        ),
        "adaFormer": AdaFormer(
            num_layers=m.num_layers, num_heads=m.num_heads,
            activation=m.activation, use_pallas=use_pallas,
            # inference: the fused up3+c5+c6 megakernel ("mega",
            # ops/decoder_tail_pallas.py::tail3_fused, forward-only,
            # 2.23 vs 2.64 ms/frame decoder time at B=8 512^2);
            # training: the differentiable megakernel ("mega_train",
            # fused forward + hand-derived XLA col backward; "col" via
            # ModelConfig.train_decoder is the A/B fallback)
            packed_decoder=packed_decoder,
            # fused IN+Q-projection prologue is forward-only (no VJP) —
            # inference builds only; it engages on the KV-cached path.
            fuse_prologue=use_pallas and not for_training,
        ),
        "vgg19": VGG19Features(),
    }


def init_params(rng: jax.Array, cfg: ImageTrainConfig, models=None) -> Dict:
    """Initialise the three trainable networks (+ random VGG placeholder —
    real runs import torchvision weights via mhada_tpu.interop)."""
    models = models or build_models(cfg, for_training=True)
    h, w = cfg.image_size
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    p_vc = models["vit_c"].init(k1, x)["params"]
    p_vs = models["vit_s"].init(k2, x)["params"]
    fc = models["vit_c"].apply({"params": p_vc}, x)
    fs = models["vit_s"].apply({"params": p_vs}, x)
    p_ada = models["adaFormer"].init(k3, fc, fs)["params"]
    p_vgg = models["vgg19"].init(k4, x)["params"]
    return {
        "trainable": {"vit_c": p_vc, "vit_s": p_vs, "adaFormer": p_ada},
        "vgg19": p_vgg,
    }


def make_optimizer(cfg) -> optax.GradientTransformation:
    # torch.optim.Adam defaults (betas 0.9/0.999, eps 1e-8) — train_image.py:70-72.
    return optax.adam(cfg.lr, b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(rng: jax.Array, cfg: ImageTrainConfig) -> Tuple[TrainState, Dict]:
    params = init_params(rng, cfg)
    tx = make_optimizer(cfg)
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params["trainable"],
            opt_state=tx.init(params["trainable"]),
        ),
        params["vgg19"],
    )


def _maybe_remat(fn, enable: bool):
    return jax.checkpoint(fn) if enable else fn


def _cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def resolve_fused_sweeps(cfg) -> bool:
    """Whether the loss batches its repeated network sweeps (see
    ImageTrainConfig.fused_sweeps).  "auto" -> OFF: batching measured
    slower on v5e (210 vs 160 ms/step at the recipe shape — XLA
    schedules the narrow per-sweep graphs better).  Explicit True is
    honoured; it is only exact under attn_mode="spatial" (the
    batch_coupled reference quirk couples the batch axis, so batching
    changes which images attend to each other)."""
    fused = getattr(cfg, "fused_sweeps", "auto")
    if fused == "auto":
        return False
    if fused and getattr(
            getattr(cfg, "model", None), "attn_mode", "spatial"
    ) == "batch_coupled":
        import warnings

        warnings.warn(
            "fused_sweeps=True with attn_mode='batch_coupled' changes "
            "training semantics: batching the sweeps alters which images "
            "attend to each other through the batch-axis attention quirk "
            "(reference vit.py:48).  Only attn_mode='spatial' is exact.",
            stacklevel=2,
        )
    return bool(fused)


def image_loss_fn(params, vgg_params, content, style, models, cfg):
    """The full image objective (reference train_image.py:103-136)."""
    if getattr(cfg, "compute_dtype", "float32") == "bfloat16":
        # mixed precision: bf16 forward/backward, f32 master params/Adam.
        # Gradient of astype is astype back, so grads land in f32.
        params = _cast_tree(params, jnp.bfloat16)
        vgg_params = _cast_tree(vgg_params, jnp.bfloat16)
        content = content.astype(jnp.bfloat16)
        style = style.astype(jnp.bfloat16)
    vit_c, vit_s, ada, vgg = (
        models["vit_c"], models["vit_s"], models["adaFormer"], models["vgg19"]
    )
    pc, ps, pa = params["vit_c"], params["vit_s"], params["adaFormer"]
    remat = getattr(cfg, "remat", False)
    vit_c_of = _maybe_remat(
        lambda p, x: vit_c.apply({"params": p}, x), remat
    )
    vit_s_of = _maybe_remat(
        lambda p, x: vit_s.apply({"params": p}, x), remat
    )
    ada_of = _maybe_remat(
        lambda p, a, b: ada.apply({"params": p}, a, b), remat
    )

    vgg_of = _maybe_remat(
        lambda x: vgg.apply({"params": vgg_params}, x), remat
    )

    if resolve_fused_sweeps(cfg):
        # one sweep per network: 4 ViT applies -> 2 at 2B, 3 AdaFormer
        # applies -> 1 at 3B, 5 VGG sweeps -> 1 at 5B (fewer, larger ops;
        # ~10% step time at the recipe shape, scripts/train_probe.py)
        bsz = content.shape[0]
        both = jnp.concatenate([content, style], axis=0)
        enc_c = vit_c_of(pc, both)
        enc_s = vit_s_of(ps, both)
        fc_vc = [f[:bsz] for f in enc_c]
        fs_vc = [f[bsz:] for f in enc_c]
        fc_vs = [f[:bsz] for f in enc_s]
        fs_vs = [f[bsz:] for f in enc_s]
        _, out3 = ada_of(
            pa,
            [jnp.concatenate([a, a, b]) for a, b in zip(fc_vc, fs_vc)],
            [jnp.concatenate([a, b, a]) for a, b in zip(fs_vs, fc_vs)],
        )
        cs, cc, ss = out3[:bsz], out3[bsz:2 * bsz], out3[2 * bsz:]
        vgg_all = vgg_of(jnp.concatenate([style, content, cs, cc, ss]))
        vgg_fs, vgg_fc, vgg_fcs, vgg_fcc, vgg_fss = (
            jax.tree.map(lambda v: v[i * bsz:(i + 1) * bsz], vgg_all)
            for i in range(5)
        )
    else:
        fc_vc = vit_c_of(pc, content)
        fs_vs = vit_s_of(ps, style)
        _, cs = ada_of(pa, fc_vc, fs_vs)

        fc_vs = vit_s_of(ps, content)
        fs_vc = vit_c_of(pc, style)
        _, cc = ada_of(pa, fc_vc, fc_vs)
        _, ss = ada_of(pa, fs_vc, fs_vs)

        vgg_fs = vgg_of(style)
        vgg_fc = vgg_of(content)
        vgg_fcs = vgg_of(cs)
        vgg_fcc = vgg_of(cc)
        vgg_fss = vgg_of(ss)

    loss_gs = L.global_style_loss(vgg_fcs, vgg_fs) * cfg.lambda_gs
    loss_lf = (
        L.local_feature_loss(vgg_fc, vgg_fs, vgg_fcs, cfg.model.activation)
        * cfg.lambda_lf
    )
    loss_id1 = L.identity_loss_1(cc, content, ss, style) * cfg.lambda_id1
    loss_id2 = L.identity_loss_2(vgg_fcc, vgg_fc, vgg_fss, vgg_fs) * cfg.lambda_id2
    loss = loss_gs + loss_lf + loss_id1 + loss_id2
    metrics = {
        "loss": loss, "loss_gs": loss_gs, "loss_lf": loss_lf,
        "loss_id1": loss_id1, "loss_id2": loss_id2,
    }
    return loss, metrics


def make_image_train_step(cfg: ImageTrainConfig, models=None, donate: bool = True):
    """Returns jitted ``step(state, vgg_params, content, style) -> (state, metrics)``.

    content/style: (B, H, W, 3) float32 0-255, shardable on the batch axis.
    """
    models = models or build_models(cfg, for_training=True)
    tx = make_optimizer(cfg)

    def step(state: TrainState, vgg_params, content, style):
        # batches may arrive as uint8 (run_image ships them that way:
        # decoded pixels are integral, so the quarter-size host->device
        # transfer is lossless); compute always starts from float32
        content = content.astype(jnp.float32)
        style = style.astype(jnp.float32)
        (loss, metrics), grads = jax.value_and_grad(
            image_loss_fn, has_aux=True
        )(state.params, vgg_params, content, style, models, cfg)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())
