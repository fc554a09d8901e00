"""Video temporal-consistency eval (reference exps_video.py).

Per consecutive frame pair of a clip: stylise both frames with one shared
style encoding, compute content flows (fwd+bwd) and the stylised pair's
backward flow with a pluggable ``flow_fn`` (the reference uses RAFT-large —
provide any (img1, img2) -> (H, W, 2) model, e.g. a jitted JAX flow net or a
precomputed-flow lookup), then accumulate:

- Warping Error = sqrt(sum_t [ sum(mask * (cs2 - warp(cs1, flow_bwd))^2)
                               / (C*H*W) ] / T)                (exps_video.py:109-133)
- Flow MSE      = mean_t MSE(flow_bwd(content), flow_bwd(stylised))
                                                              (exps_video.py:117,135)
"""

from typing import Callable, Dict, Iterable, Tuple

import numpy as np
import jax.numpy as jnp

from ..data.flow_np import flow_warp_mask_np, warp_np


def video_frame_pairs(video_path: str, resize_wh: Tuple[int, int]) -> Iterable:
    """Yield consecutive RGB float32 frame pairs from a video file."""
    import cv2

    from ..utils.image_io import cv2_to_tensor

    cap = cv2.VideoCapture(video_path)
    prev = None
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        cur = cv2_to_tensor(frame, resize=resize_wh)
        if prev is not None:
            yield prev, cur
        prev = cur
    cap.release()


def evaluate_clip(
    frame_pairs: Iterable,
    stylize_pair: Callable,
    flow_fn: Callable,
) -> Dict[str, float]:
    """frame_pairs yields (c1, c2) HWC 0-255; ``stylize_pair(c1, c2)`` returns
    clamped (cs1, cs2); ``flow_fn(a, b)`` returns the flow of a<-b in pixels."""
    warping_error = 0.0
    flow_mse = 0.0
    count = 0
    for c1, c2 in frame_pairs:
        cs1, cs2 = stylize_pair(c1, c2)
        c_flow_01 = flow_fn(c1, c2)
        c_flow_10 = flow_fn(c2, c1)
        cs_flow_10 = flow_fn(np.asarray(cs2), np.asarray(cs1))

        mask = flow_warp_mask_np(c_flow_01, c_flow_10)
        warped_cs1 = warp_np(np.asarray(cs1), c_flow_10)
        C = cs1.shape[-1]
        H, W = cs1.shape[0], cs1.shape[1]
        num = np.sum(mask[..., None] * (np.asarray(cs2) - warped_cs1) ** 2)
        warping_error += num / (C * H * W)
        flow_mse += float(np.mean((c_flow_10 - cs_flow_10) ** 2))
        count += 1
    return {
        "warping_error": float(np.sqrt(warping_error / count)),
        "flow_mse": flow_mse / count,
        "frames": count,
    }


def make_flow_fn(backend: str = "farneback"):
    """Flow backend factory.

    - ``"raft"`` / ``"raft:<weights.pth>"`` — JAX RAFT-large on imported
      torchvision weights (the reference protocol, exps_video.py:45);
      without an explicit path the ``MHADA_RAFT_WEIGHTS`` env var is used.
    - ``"farneback"`` — weight-free classical stand-in (default so the
      harness runs without external downloads; numbers are then NOT
      comparable to reference-protocol ones).
    """
    from ..data.flow_models import farneback_flow_fn, make_raft_flow_fn

    if backend == "farneback":
        return farneback_flow_fn()
    if backend.startswith("raft"):
        import os

        path = (backend.split(":", 1)[1] if ":" in backend
                else os.environ.get("MHADA_RAFT_WEIGHTS"))
        if not path:
            raise ValueError(
                "raft backend needs weights: use 'raft:<raft_large.pth>' or "
                "set MHADA_RAFT_WEIGHTS")
        return make_raft_flow_fn(path)
    raise ValueError(f"unknown flow backend: {backend}")


def make_stylize_pair_fn(params, models, style_hwc, dtype=jnp.float32):
    """Shared-style two-frame stylizer (style encoded once,
    exps_video.py:52-58 / infer_video.py:58-61)."""
    from ..infer.image import make_encode_style_fn, make_stylize_with_fs_fn

    fs = make_encode_style_fn(models, dtype)(params, jnp.asarray(style_hwc)[None])
    fn = make_stylize_with_fs_fn(models, dtype)

    def stylize_pair(c1, c2):
        cs1 = fn(params, jnp.asarray(c1)[None], fs)[0]
        cs2 = fn(params, jnp.asarray(c2)[None], fs)[0]
        return np.asarray(cs1), np.asarray(cs2)

    return stylize_pair


def main(argv=None):
    import argparse

    import jax

    from ..config import ModelConfig
    from ..train.train_image import build_models
    from ..infer.image import init_inference_params, load_ckpt_params, default_attn_mode
    from ..utils.image_io import load_image

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--video", required=True)
    ap.add_argument("--style", required=True)
    ap.add_argument("--size", type=int, nargs=2, default=(256, 512),
                    help="content H W")
    ap.add_argument("--style-size", type=int, nargs=2, default=(256, 256))
    ap.add_argument("--flow", default="farneback",
                    help="flow backend (reference uses RAFT)")
    ap.add_argument("--max-pairs", type=int, default=0)
    ap.add_argument("--ada")
    ap.add_argument("--vitc")
    ap.add_argument("--vits")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args(argv)

    models = build_models(
        ModelConfig(attn_mode=default_attn_mode(args.ada))
    )
    if args.ada:
        params = load_ckpt_params(args.ada, args.vitc, args.vits)
    else:
        print("WARNING: random weights (smoke mode)")
        params = init_inference_params(models, jax.random.PRNGKey(0))
    style = load_image(args.style, tuple(args.style_size))
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    stylize_pair = make_stylize_pair_fn(params, models, style, dtype)
    pairs = video_frame_pairs(args.video, (args.size[1], args.size[0]))
    if args.max_pairs:
        import itertools

        pairs = itertools.islice(pairs, args.max_pairs)
    out = evaluate_clip(pairs, stylize_pair, make_flow_fn(args.flow))
    print(f"Warping Error: {out['warping_error']}")
    print(f"Flow MSE: {out['flow_mse']}")


if __name__ == "__main__":
    main()
