from .metrics import (
    compute_histogram,
    kl_divergence,
    nth_order_moment,
    uniformity,
    average_entropy,
    ssim,
    gram_loss,
)

__all__ = [
    "compute_histogram",
    "kl_divergence",
    "nth_order_moment",
    "uniformity",
    "average_entropy",
    "ssim",
    "gram_loss",
]
