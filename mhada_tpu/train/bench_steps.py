"""Train-step TPU benchmark protocol (PERF.md; VERDICT r1 item 8).

Reference recipe shapes: image 256^2 B=8 (reference train_image.py:14-28),
video 256x512 B=2 + 256^2 style (train_video.py:14-28); f32 / bf16 / remat
variants.  Timing queues ``--steps`` dispatches and syncs once on the final
loss readback (block_until_ready does not wait on the axon platform).

Run: ``python -m mhada_tpu.train.bench_steps [--steps 10] [--variants ...]``
Prints one table row per variant: variant, ms/step, steps/sec.
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def _rand(rng, shape):
    from ..utils.device import commit_to_device

    return commit_to_device(
        jnp.asarray(rng.uniform(0, 255, shape), jnp.float32))


def bench_image(cfg, steps: int):
    from .train_image import create_train_state, make_image_train_step

    state, vgg = create_train_state(jax.random.PRNGKey(0), cfg)
    from ..utils.device import commit_to_device

    state = jax.tree.map(commit_to_device, state)
    vgg = jax.tree.map(commit_to_device, vgg)
    rng = np.random.default_rng(0)
    h, w = cfg.image_size
    content = _rand(rng, (cfg.batch_size, h, w, 3))
    style = _rand(rng, (cfg.batch_size, h, w, 3))
    step = make_image_train_step(cfg, donate=False)

    state, m = step(state, vgg, content, style)
    _ = float(m["loss"])  # compile + sync
    t0 = time.perf_counter()
    for _i in range(steps):
        state, m = step(state, vgg, content, style)
    _ = float(m["loss"])
    return (time.perf_counter() - t0) / steps


def bench_video(cfg, steps: int):
    from ..config import ImageTrainConfig
    from ..utils.device import commit_to_device
    from .train_image import (
        TrainState, init_params, make_optimizer,
    )
    from .train_video import make_video_train_step

    icfg = ImageTrainConfig(model=cfg.model, image_size=cfg.style_size)
    params = init_params(jax.random.PRNGKey(0), icfg)
    tx = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params["trainable"],
        opt_state=tx.init(params["trainable"]),
    )
    vgg = params["vgg19"]
    state = jax.tree.map(commit_to_device, state)
    vgg = jax.tree.map(commit_to_device, vgg)
    rng = np.random.default_rng(0)
    hs, ws = cfg.style_size
    h, w = cfg.content_size
    b = cfg.batch_size
    style = _rand(rng, (b, hs, ws, 3))
    c1 = _rand(rng, (b, h, w, 3))
    c2 = _rand(rng, (b, h, w, 3))
    flow = commit_to_device(
        jnp.asarray(rng.uniform(-5, 5, (b, h, w, 2)), jnp.float32))
    mask = commit_to_device(
        jnp.asarray(rng.uniform(0, 1, (b, h, w)) > 0.2, jnp.float32))
    step = make_video_train_step(cfg, donate=False)

    state, m = step(state, vgg, style, c1, c2, flow, mask)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _i in range(steps):
        state, m = step(state, vgg, style, c1, c2, flow, mask)
    _ = float(m["loss"])
    return (time.perf_counter() - t0) / steps


VARIANTS = ("image_f32", "image_bf16", "image_f32_remat", "video_f32",
            "video_bf16", "image_bf16_fuseln", "image_bf16_coldec")


def main(argv=None):
    from dataclasses import replace

    from ..config import ImageTrainConfig, VideoTrainConfig

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--variants", nargs="*", default=list(VARIANTS))
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes (CPU smoke test, not a benchmark)")
    args = ap.parse_args(argv)

    icfg = ImageTrainConfig()
    vcfg = VideoTrainConfig()
    if args.tiny:
        from ..config import ModelConfig

        tiny = ModelConfig(num_layers=1, num_heads=2, hidden_dim=64,
                           mlp_dim=128)
        icfg = replace(icfg, model=tiny, batch_size=2, image_size=(32, 32))
        vcfg = replace(vcfg, model=tiny, batch_size=2, style_size=(32, 32),
                       content_size=(32, 64))
    runs = {
        "image_f32": lambda: bench_image(icfg, args.steps),
        "image_bf16": lambda: bench_image(
            replace(icfg, compute_dtype="bfloat16"), args.steps),
        "image_f32_remat": lambda: bench_image(
            replace(icfg, remat=True), args.steps),
        "video_f32": lambda: bench_video(vcfg, args.steps),
        "video_bf16": lambda: bench_video(
            replace(vcfg, compute_dtype="bfloat16"), args.steps),
        # A/B of the round-4 differentiable LN+matmul fusion in training
        "image_bf16_fuseln": lambda: bench_image(
            replace(icfg, compute_dtype="bfloat16",
                    model=replace(icfg.model, fuse_ln=True)), args.steps),
        # A/B of the round-5 differentiable megakernel decoder tail:
        # this variant forces the round-3/4 XLA col path
        "image_bf16_coldec": lambda: bench_image(
            replace(icfg, compute_dtype="bfloat16",
                    model=replace(icfg.model, train_decoder="col")),
            args.steps),
    }
    print(f"{'variant':<18} {'ms/step':>9} {'steps/s':>9}")
    for name in args.variants:
        dt = runs[name]()
        print(f"{name:<18} {dt*1e3:>9.1f} {1.0/dt:>9.2f}", flush=True)


if __name__ == "__main__":
    main()
