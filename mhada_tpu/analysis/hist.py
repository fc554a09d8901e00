"""BGR histogram plots (reference hist.py:5-40)."""

import os
from typing import List, Optional


def plot_bgr_histograms(
    image_paths: List[str], out_path: Optional[str] = None, show: bool = False
):
    import cv2
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(image_paths)
    fig, axes = plt.subplots(1, n, figsize=(5 * n, 4), squeeze=False)
    for ax, path in zip(axes[0], image_paths):
        img = cv2.imread(path)
        for ch, color in enumerate(("b", "g", "r")):
            hist = cv2.calcHist([img], [ch], None, [256], [0, 256])
            ax.plot(hist, color=color)
        ax.set_title(os.path.basename(path))
        ax.set_xlim([0, 256])
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path)
    if show:
        plt.show()
    plt.close(fig)
    return out_path
