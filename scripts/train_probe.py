"""Per-stage device-time attribution of the image train step (VERDICT r2
item 7), at the reference recipe shape (256^2, B=8) in bf16.

Methodology mirrors scripts/tpu_probe.py: jit a nested sequence of
sub-graphs (forward stages, per-loss value_and_grad variants), queue
``--iters`` dispatches each, sync once on a scalar readback; deltas between
variants attribute device time.  Absolute numbers include the ~1.3-1.8 ms
axon dispatch overhead.

Run: python scripts/train_probe.py [--iters 10] [--dtype bfloat16]
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
        build_models, create_train_state, image_loss_fn, make_optimizer,
    )
    from mhada_tpu.train import losses as L
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
    content = commit_to_device(
        jnp.asarray(rng.uniform(0, 255, (cfg.batch_size, h, w, 3)),
                    jnp.float32))
    style = commit_to_device(
        jnp.asarray(rng.uniform(0, 255, (cfg.batch_size, h, w, 3)),
                    jnp.float32))
    tx = make_optimizer(cfg)

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    def cast(t):
        return jax.tree.map(
            lambda x: x.astype(dt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)

    vit_c, vit_s, ada, vggm = (models["vit_c"], models["vit_s"],
                               models["adaFormer"], models["vgg19"])

    def three_forwards(params, content, style):
        p = cast(params)
        c, s = content.astype(dt), style.astype(dt)
        pc, ps, pa = p["vit_c"], p["vit_s"], p["adaFormer"]
        fc_vc = vit_c.apply({"params": pc}, c)
        fs_vs = vit_s.apply({"params": ps}, s)
        _, cs = ada.apply({"params": pa}, fc_vc, fs_vs)
        fc_vs = vit_s.apply({"params": ps}, c)
        fs_vc = vit_c.apply({"params": pc}, s)
        _, cc = ada.apply({"params": pa}, fc_vc, fc_vs)
        _, ss = ada.apply({"params": pa}, fs_vc, fs_vs)
        return cs, cc, ss

    def vgg5(params, content, style, outs):
        vp = cast(vgg)
        cs, cc, ss = outs
        return [vggm.apply({"params": vp}, x)
                for x in (content.astype(dt), style.astype(dt), cs, cc, ss)]

    # --- forward-only stages ---
    fwd = jax.jit(lambda p, c, s: jnp.sum(
        sum(jnp.sum(x) for x in three_forwards(p, c, s))))
    fwd_vgg = jax.jit(lambda p, c, s: sum(
        jnp.sum(f["relu5_1"])
        for f in vgg5(p, c, s, three_forwards(p, c, s))))

    def loss_of(terms):
        """Minimal subgraph per term (zero-lambda terms in the full loss
        are NOT reliably DCE'd, so per-term timing builds only what the
        term reads)."""
        if terms == ("gs", "lf", "id1", "id2"):
            return lambda p, vp, c, s: image_loss_fn(
                p, vp, c, s, models, cfg)[0]

        def fn(params, vgg_params, content, style):
            p, vp = cast(params), cast(vgg_params)
            c, s = content.astype(dt), style.astype(dt)
            pc, ps, pa = p["vit_c"], p["vit_s"], p["adaFormer"]
            V = lambda x: vggm.apply({"params": vp}, x)
            fc_vc = vit_c.apply({"params": pc}, c)
            fs_vs = vit_s.apply({"params": ps}, s)
            _, cs = ada.apply({"params": pa}, fc_vc, fs_vs)
            if "id1" in terms or "id2" in terms:
                fc_vs = vit_s.apply({"params": ps}, c)
                fs_vc = vit_c.apply({"params": pc}, s)
                _, cc = ada.apply({"params": pa}, fc_vc, fc_vs)
                _, ss = ada.apply({"params": pa}, fs_vc, fs_vs)
            loss = 0.0
            if "gs" in terms:
                loss += L.global_style_loss(V(cs), V(s)) * cfg.lambda_gs
            if "lf" in terms:
                loss += L.local_feature_loss(
                    V(c), V(s), V(cs), cfg.model.activation) * cfg.lambda_lf
            if "id1" in terms:
                loss += L.identity_loss_1(cc, c, ss, s) * cfg.lambda_id1
            if "id2" in terms:
                loss += L.identity_loss_2(
                    V(cc), V(c), V(ss), V(s)) * cfg.lambda_id2
            return loss
        return fn

    def grad_step(terms):
        @jax.jit
        def step(params, vgg, content, style):
            loss, grads = jax.value_and_grad(loss_of(terms))(
                params, vgg, content, style)
            return loss, grads
        return step

    rows = []

    def rec(name, t):
        rows.append((name, t))
        print(f"{name:32s}: {t * 1e3:8.2f} ms/step", flush=True)

    rec("fwd 3x(vit+ada)", timeit(fwd, state.params, content, style,
                                  iters=args.iters))
    rec("fwd + 5x vgg", timeit(fwd_vgg, state.params, content, style,
                               iters=args.iters))
    for name in ("gs", "lf", "id1", "id2"):
        rec(f"grad[{name} only]",
            timeit(grad_step((name,)), state.params, vgg, content, style,
                   iters=args.iters))
    rec("grad[all 4 losses]",
        timeit(grad_step(("gs", "lf", "id1", "id2")), state.params, vgg,
               content, style, iters=args.iters))

    @jax.jit
    def full_step(state, vgg, content, style):
        import optax

        loss, grads = jax.value_and_grad(
            lambda p: image_loss_fn(
                p, vgg, content, style, models, cfg)[0])(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return loss, state.replace(params=params, opt_state=opt_state)

    rec("full step (+adam)",
        timeit(full_step, state, vgg, content, style, iters=args.iters))


if __name__ == "__main__":
    main()
