"""Pluggable optical-flow backends for eval datasets.

The reference computes flow with torchvision RAFT-large (datasets.py:98,
exps_video.py:45).  RAFT weights are an external download; this module
provides the ``flow_fn`` plug points:

- ``farneback_flow_fn``   classical dense flow (cv2, no weights) — default
  stand-in so the temporal harnesses run everywhere.  Numbers differ from
  RAFT-based ones; record the backend next to any published metric.
- ``raft_flow_fn``        wraps any flow callable; ``make_raft_flow_fn``
  builds it from the in-tree JAX RAFT-large port (``models/raft.py``) on
  imported torchvision weights — the reference-protocol backend.

All flow fns map (img1_rgb_255, img2_rgb_255) HWC float32 -> (H, W, 2) pixel
flow of img1 -> img2.
"""

from typing import Callable

import numpy as np


def farneback_flow_fn(
    pyr_scale=0.5, levels=4, winsize=21, iterations=3,
    poly_n=7, poly_sigma=1.5,
) -> Callable:
    import cv2

    def fn(img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
        g1 = cv2.cvtColor(img1.astype(np.uint8), cv2.COLOR_RGB2GRAY)
        g2 = cv2.cvtColor(img2.astype(np.uint8), cv2.COLOR_RGB2GRAY)
        return cv2.calcOpticalFlowFarneback(
            g1, g2, None, pyr_scale, levels, winsize, iterations,
            poly_n, poly_sigma, 0,
        ).astype(np.float32)

    return fn


def raft_flow_fn(apply_fn: Callable) -> Callable:
    """Wrap a (jitted) flow model taking [-1,1]-normalised image pairs
    (the reference's raftTransforms domain, utilities.py:19-26)."""

    def fn(img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
        a = img1 / 255.0 * 2.0 - 1.0
        b = img2 / 255.0 * 2.0 - 1.0
        return np.asarray(apply_fn(a[None], b[None]))[0]

    return fn


def make_raft_flow_fn(weights_path: str, num_iters: int = 12) -> Callable:
    """Reference-protocol flow: JAX RAFT-large on imported torchvision
    weights (reference datasets.py:98-121, exps_video.py:45-46; the last of
    ``num_iters`` recurrent refinements is returned)."""
    import jax

    from ..interop import load_pth
    from ..models.raft import RAFT, import_raft

    params = import_raft(load_pth(weights_path))
    model = RAFT(num_iters=num_iters)

    @jax.jit
    def apply_fn(a, b):
        return model.apply({"params": params}, a, b)[-1]

    return raft_flow_fn(apply_fn)


def default_flow_fn(raft_weights: str | None = None) -> Callable:
    """RAFT when weights are available (reference protocol), else Farnebäck.

    ``raft_weights`` defaults to the ``MHADA_RAFT_WEIGHTS`` env var.
    """
    import os

    path = raft_weights or os.environ.get("MHADA_RAFT_WEIGHTS")
    if path:
        return make_raft_flow_fn(path)
    return farneback_flow_fn()
