"""Image-training CLI (reference train_image.py:31-190 as a proper driver).

Epoch loop over CocoWikiArt with the jitted data-parallel train step, tqdm
postfix metrics, rolling 100-step snapshots, per-epoch weights + combined
checkpoint, resume from epoch_start-1 (reference semantics).

Usage:
  python -m mhada_tpu.train.run_image --coco ../datasets/coco \
      --wikiart ../datasets/WikiArt [--epochs 20] [--batch-size 8] \
      [--vgg /path/vgg19.pth] [--models-dir ./models]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ImageTrainConfig, ModelConfig
from ..data import CocoWikiArt, DataLoader
from ..parallel import make_mesh, shard_batch, replicate
from ..utils.image_io import to_uint8_pixels
from . import checkpoint as ckpt
from .train_image import (
    TrainState,
    create_train_state,
    make_image_train_step,
    make_optimizer,
)


def load_vgg_params(path: str):
    from ..interop import load_pth, import_vgg19

    return import_vgg19(load_pth(path))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coco", default="../datasets/coco")
    ap.add_argument("--wikiart", default="../datasets/WikiArt")
    ap.add_argument("--models-dir", default="./models")
    ap.add_argument("--epoch-start", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--image-size", type=int, nargs=2, default=(256, 256))
    ap.add_argument("--vgg", help="torchvision VGG19 .pth (IMAGENET1K_V1)")
    ap.add_argument("--attn-mode", default="spatial",
                    choices=["spatial", "batch_coupled"])
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="compute dtype (bf16: ~1.4x faster steps, f32 "
                    "master params/Adam either way)")
    ap.add_argument("--steps-per-epoch", type=int, default=0,
                    help="truncate epochs (smoke runs); 0 = full epoch")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--metrics-jsonl", help="structured per-step metrics file")
    args = ap.parse_args(argv)

    cfg = ImageTrainConfig(
        model=ModelConfig(attn_mode=args.attn_mode),
        epoch_start=args.epoch_start,
        epoch_end=args.epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        image_size=tuple(args.image_size),
        compute_dtype=args.dtype,
    )

    dataset = CocoWikiArt(cfg.image_size, args.coco, args.wikiart, seed=args.seed)
    loader = DataLoader(dataset, cfg.batch_size, num_workers=4, prefetch=2,
                        seed=args.seed)

    state, vgg_params = create_train_state(jax.random.PRNGKey(args.seed or 0), cfg)
    if args.vgg:
        vgg_params = load_vgg_params(args.vgg)
    else:
        print("WARNING: no --vgg weights; using random VGG (smoke mode only)")

    # Resume (reference train_image.py:75-84)
    if cfg.epoch_start > 1:
        path = ckpt.latest_checkpoint(args.models_dir, cfg.batch_size)
        assert path, f"no checkpoint to resume under {args.models_dir}"
        # target template keeps optax NamedTuple structure through orbax
        template = None if path.endswith(".pth") else {
            "epoch": 0,
            "batch_size": 0,
            "model_state": jax.device_get(state.params),
            "optim_state": jax.device_get(state.opt_state),
        }
        restored = ckpt.restore_checkpoint(path, template)
        state = TrainState(
            step=state.step,
            params=restored["model_state"],
            opt_state=(
                restored["optim_state"]
                or make_optimizer(cfg).init(restored["model_state"])
            ),
        )
        print(f"resumed from {path} (epoch {restored['epoch']})")

    mesh = make_mesh()  # all devices on 'data'
    vgg_params = replicate(mesh, vgg_params)
    state = replicate(mesh, state)
    step_fn = make_image_train_step(cfg)

    from ..utils.profiling import MetricsLogger

    logger = MetricsLogger(args.metrics_jsonl)
    for epoch in range(cfg.epoch_start, cfg.epoch_end + 1):
        t0 = time.time()
        for idx, (content, style) in enumerate(loader):
            if args.steps_per_epoch and idx >= args.steps_per_epoch:
                break
            # ship uint8: decoded pixels are integral (image_folder.py), so
            # this is lossless and quarters the host->device batch bytes
            # (the wall-clock bottleneck on tunnel-attached chips, PERF.md)
            batch = shard_batch(mesh, (
                jnp.asarray(to_uint8_pixels(content)),
                jnp.asarray(to_uint8_pixels(style)),
            ))
            state, metrics = step_fn(state, vgg_params, *batch)
            if idx % args.log_every == 0:
                m = logger.log(int(state.step), metrics, epoch=epoch)
                rate = (idx + 1) * cfg.batch_size / (time.time() - t0)
                print(
                    f"epoch {epoch}/{cfg.epoch_end} step {idx} "
                    + " ".join(
                        f"{k}={v:.4f}" for k, v in m.items()
                        if k not in ("step", "time", "epoch")
                    )
                    + f" ({rate:.1f} img/s)"
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
