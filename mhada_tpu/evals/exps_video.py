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
