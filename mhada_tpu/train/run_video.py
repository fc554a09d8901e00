"""Video-training CLI (reference train_video.py:35-223 as a proper driver).

Epochs 21-30 resumed from the *image* run's epoch-20 checkpoint (the resume
filename keys off the image batch size — reference train_video.py:81), over
FlyingThings3D+Monkaa x WikiArt with the six-loss video objective.

Usage:
  python -m mhada_tpu.train.run_video --datasets ../datasets \
      [--epoch-start 21] [--epochs 30] [--batch-size 2] [--vgg vgg19.pth]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..config import VideoTrainConfig, ModelConfig
from ..data import FlyingThings3DMonkaaWikiArt, DataLoader
from ..parallel import make_mesh, shard_batch, replicate
from ..utils.image_io import to_uint8_pixels
from . import checkpoint as ckpt
from .train_image import TrainState, init_params, make_optimizer
from .train_video import make_video_train_step
from .run_image import load_vgg_params


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--datasets", default="../datasets",
                    help="root containing WikiArt/ and SceneFlowDatasets/")
    ap.add_argument("--models-dir", default="./models")
    ap.add_argument("--epoch-start", type=int, default=21)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--image-batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--style-size", type=int, nargs=2, default=(256, 256))
    ap.add_argument("--content-size", type=int, nargs=2, default=(256, 512))
    ap.add_argument("--vgg")
    ap.add_argument("--attn-mode", default="spatial",
                    choices=["spatial", "batch_coupled"])
    ap.add_argument("--steps-per-epoch", type=int, default=0)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="compute dtype (bf16: faster steps; f32 master "
                    "params/Adam either way)")
    ap.add_argument("--metrics-jsonl", help="structured per-step metrics file")
    args = ap.parse_args(argv)

    cfg = VideoTrainConfig(
        model=ModelConfig(attn_mode=args.attn_mode),
        epoch_start=args.epoch_start,
        epoch_end=args.epochs,
        batch_size=args.batch_size,
        image_batch_size=args.image_batch_size,
        lr=args.lr,
        style_size=tuple(args.style_size),
        content_size=tuple(args.content_size),
        compute_dtype=args.dtype,
    )

    dataset = FlyingThings3DMonkaaWikiArt(
        cfg.style_size, cfg.content_size, args.datasets, seed=args.seed
    )
    loader = DataLoader(dataset, cfg.batch_size, num_workers=4, prefetch=2,
                        seed=args.seed)

    from ..config import ImageTrainConfig

    icfg = ImageTrainConfig(model=cfg.model, image_size=cfg.style_size)
    params = init_params(jax.random.PRNGKey(args.seed or 0), icfg)
    tx = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params["trainable"],
        opt_state=tx.init(params["trainable"]),
    )
    vgg_params = load_vgg_params(args.vgg) if args.vgg else params["vgg19"]
    if not args.vgg:
        print("WARNING: no --vgg weights; using random VGG (smoke mode only)")

    # Cross-over resume from the image run's checkpoint (train_video.py:80-89):
    # epoch_start-1 with the IMAGE batch size in the filename.
    if cfg.epoch_start > 1:
        import os

        name = (
            f"checkpoint_epoch_{cfg.epoch_start - 1}"
            f"_batchSize_{cfg.image_batch_size}"
        )
        path = os.path.join(args.models_dir, name)
        if not os.path.exists(path):
            alt = ckpt.latest_checkpoint(args.models_dir, cfg.batch_size)
            assert alt, f"no checkpoint at {path} nor any batchSize_{cfg.batch_size}"
            path = alt
        template = {
            "epoch": 0, "batch_size": 0,
            "model_state": jax.device_get(state.params),
            "optim_state": jax.device_get(state.opt_state),
        }
        restored = ckpt.restore_checkpoint(path, template)
        state = TrainState(
            step=state.step,
            params=restored["model_state"],
            opt_state=restored["optim_state"]
            or tx.init(restored["model_state"]),
        )
        print(f"resumed from {path} (epoch {restored['epoch']})")

    mesh = make_mesh()
    vgg_params = replicate(mesh, vgg_params)
    state = replicate(mesh, state)
    step_fn = make_video_train_step(cfg)

    from ..utils.profiling import MetricsLogger

    logger = MetricsLogger(args.metrics_jsonl)
    for epoch in range(cfg.epoch_start, cfg.epoch_end + 1):
        t0 = time.time()
        for idx, batch in enumerate(loader):
            if args.steps_per_epoch and idx >= args.steps_per_epoch:
                break
            style, c1, c2, flow, mask = batch
            # images ship as uint8 (lossless — PIL-decoded pixels are
            # integral; quarter H2D bytes, see run_image); flow/mask may
            # be fractional and stay float32
            style, c1, c2, flow, mask = shard_batch(
                mesh, (
                    jnp.asarray(to_uint8_pixels(style)),
                    jnp.asarray(to_uint8_pixels(c1)),
                    jnp.asarray(to_uint8_pixels(c2)),
                    jnp.asarray(flow),
                    jnp.asarray(mask),
                )
            )
            state, metrics = step_fn(state, vgg_params, style, c1, c2, flow, mask)
            if idx % args.log_every == 0:
                m = logger.log(int(state.step), metrics, epoch=epoch)
                m = {k: v for k, v in m.items()
                     if k not in ("step", "time", "epoch")}
                print(
                    f"epoch {epoch}/{cfg.epoch_end} step {idx} "
                    + " ".join(f"{k}={v:.4f}" for k, v in m.items())
                )
            if idx % 100 == 0:
                ckpt.save_weights(args.models_dir, jax.device_get(state.params))
        params_host = jax.device_get(state.params)
        ckpt.save_weights(
            args.models_dir, params_host,
            suffix=f"_epoch_{epoch}_batchSize_{cfg.batch_size}",
        )
        ckpt.save_checkpoint(
            args.models_dir, epoch, cfg.batch_size, params_host,
            jax.device_get(state.opt_state),
        )
        print(f"epoch {epoch} done in {time.time() - t0:.1f}s; checkpoint saved")


if __name__ == "__main__":
    main()
