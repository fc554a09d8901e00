"""Single-Image FID (reference SIFID/sifid_score.py).

Activations are collected **per spatial location** (sifid_score.py:119:
(B, C, H, W) -> (B*H*W, C)), then mean/covariance -> Fréchet distance with
sqrtm stabilisation (sifid_score.py:128-205).  Images load as RGB (0,1).
"""

from typing import Optional

import numpy as np
import jax.numpy as jnp

from .inception import InceptionV3Features, BLOCK_INDEX_BY_DIM, import_inception


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6) -> float:
    """Fréchet distance between two Gaussians (sifid_score.py:128-182)."""
    from scipy import linalg

    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    tr_covmean = np.trace(covmean)
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * tr_covmean
    )


def _load_01(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.float32) / 255.0


class SIFID:
    """Reusable SIFID evaluator.

    inception_params: imported torchvision inception_v3 weights
    (``import_inception``); dims selects the tap (64/192/768/2048).
    """

    def __init__(self, inception_params, dims: int = 2048):
        self.block = BLOCK_INDEX_BY_DIM[dims]
        self.model = InceptionV3Features(last_block=self.block)
        self.params = inception_params

    def activations(self, img01: np.ndarray) -> np.ndarray:
        """(H, W, 3) in (0,1) -> (H'*W', C) per-location activations."""
        feats = self.model.apply(
            {"params": self.params}, jnp.asarray(img01)[None]
        )[self.block]
        f = np.asarray(feats[0], dtype=np.float64)
        return f.reshape(-1, f.shape[-1])

    def statistics(self, img01: np.ndarray):
        act = self.activations(img01)
        return act.mean(axis=0), np.cov(act, rowvar=False)

    def __call__(self, path0: str, path1: str) -> float:
        m1, s1 = self.statistics(_load_01(path0))
        m2, s2 = self.statistics(_load_01(path1))
        return calculate_frechet_distance(m1, s1, m2, s2)


def sifid_from_paths(
    path0: str,
    path1: str,
    inception_pth: str,
    dims: int = 2048,
    evaluator: Optional[SIFID] = None,
) -> float:
    """Convenience wrapper (reference eval.py:246-276)."""
    if evaluator is None:
        from ..interop import load_pth

        evaluator = SIFID(import_inception(load_pth(inception_pth)), dims)
    return evaluator(path0, path1)
