"""Component-level fwd+bwd attribution of the image train step
(scripts/train_probe.py gives the loss-term level; this isolates the
networks), plus XLA-cost-analysis FLOPs for a training-MFU estimate.

Times value_and_grad of a scalar readout of each component alone at the
reference recipe shape (256^2 B=8, bf16): ViT apply, MHAda chain (no
decoder), decoder alone, VGG sweep (grad w.r.t. the input image — VGG
params are frozen in training, so that is the gradient the real step
computes).

Run: python scripts/train_probe2.py [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    from dataclasses import replace

    from mhada_tpu.config import ImageTrainConfig
    from mhada_tpu.train.train_image import (
        build_models, create_train_state, image_loss_fn,
    )
    from mhada_tpu.utils.device import commit_to_device

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    cfg = replace(ImageTrainConfig(), compute_dtype=args.dtype)
    models = build_models(cfg, for_training=True)
    state, vgg = create_train_state(jax.random.PRNGKey(0), cfg)
    state = jax.tree.map(commit_to_device, state)
    vgg = jax.tree.map(commit_to_device, vgg)
    rng = np.random.default_rng(0)
    h, w = cfg.image_size
    B = cfg.batch_size
    content = commit_to_device(
        jnp.asarray(rng.uniform(0, 255, (B, h, w, 3)), jnp.float32))
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    def cast(t):
        return jax.tree.map(
            lambda x: x.astype(dt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)

    vit_c, ada, vggm = models["vit_c"], models["adaFormer"], models["vgg19"]

    # precomputed bf16 features for the ada/decoder-only probes
    pc = cast(state.params["vit_c"])
    feats = jax.jit(
        lambda p, x: vit_c.apply({"params": p}, x.astype(dt)))(pc, content)
    feats = commit_to_device(jax.tree.map(jnp.asarray, feats))
    fcs_map = commit_to_device(feats[0])

    def rec(name, t):
        print(f"{name:28s}: {t * 1e3:8.2f} ms", flush=True)

    # --- fwd+bwd per component (value_and_grad w.r.t. params) ---
    @jax.jit
    def g_vit(params, x):
        def f(p):
            fs = vit_c.apply({"params": cast(p)}, x.astype(dt))
            return sum(jnp.sum(t.astype(jnp.float32)) for t in fs)
        return jax.value_and_grad(f)(params)

    @jax.jit
    def g_ada_full(params, fc):
        def f(p):
            _, cs = ada.apply({"params": cast(p)}, fc, fc)
            return jnp.sum(cs.astype(jnp.float32))
        return jax.value_and_grad(f)(params)

    @jax.jit
    def g_dec(params, x):
        from mhada_tpu.models import Decoder

        dec = Decoder(packed=ada.packed_decoder)

        def f(p):
            return jnp.sum(dec.apply(
                {"params": cast(p)["decoder"]}, x).astype(jnp.float32))
        return jax.value_and_grad(f)(params)

    @jax.jit
    def g_vgg_wrt_input(vp, x):
        def f(xi):
            fs = vggm.apply({"params": cast(vp)}, xi.astype(dt))
            return sum(jnp.sum(t.astype(jnp.float32)) for t in fs.values())
        return jax.value_and_grad(f)(x)

    rec("vit fwd+bwd (1 apply)", timeit(g_vit, state.params["vit_c"],
                                        content, iters=args.iters))
    rec("ada+dec fwd+bwd (1 apply)",
        timeit(g_ada_full, state.params["adaFormer"], feats,
               iters=args.iters))
    rec("decoder fwd+bwd (1 apply)",
        timeit(g_dec, state.params["adaFormer"], fcs_map, iters=args.iters))
    rec("vgg fwd+bwd-to-input (1)",
        timeit(g_vgg_wrt_input, vgg, content, iters=args.iters))

    # --- FLOPs of the real full step via XLA cost analysis ---
    def loss_only(params, vgg_params, c, s):
        return image_loss_fn(params, vgg_params, c, s, models, cfg)[0]

    grad_fn = jax.jit(jax.value_and_grad(loss_only))
    lowered = grad_fn.lower(state.params, vgg, content, content)
    ca = lowered.compile().cost_analysis()
    flops = ca.get("flops", float("nan"))
    print(f"full grad-step flops (XLA): {flops / 1e12:.2f} TF", flush=True)
    print(f"  at 160 ms: {flops / 1e12 / 0.160:.1f} TF/s "
          f"(peak bf16 ~197) -> MFU {flops / 1e12 / 0.160 / 197:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
