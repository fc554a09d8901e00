"""Checkpointing with the reference's tree and filename semantics.

Reference (train_image.py:160-186): per-epoch weight files
``{AdaFormer,ViT_C,ViT_S}_epoch_{E}_batchSize_{B}.pth`` + a combined
checkpoint ``checkpoint_epoch_{E}_batchSize_{B}`` holding
{epoch, batch_size, model_state{...}, optim_state{...}}, plus rolling
un-suffixed snapshots every 100 steps.  The filename scheme is load-bearing:
video training resumes from the *image* run's epoch-20 file
(train_video.py:81).

We mirror the same tree and names as orbax checkpoints (directories instead
of .pth files) and can also *read* reference .pth checkpoints directly via
mhada_tpu.interop.
"""

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _as_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    directory: str,
    epoch: int,
    batch_size: int,
    params: Dict[str, Any],
    opt_state: Any,
    name: Optional[str] = None,
) -> str:
    """Save combined checkpoint; returns its path."""
    name = name or f"checkpoint_epoch_{epoch}_batchSize_{batch_size}"
    path = os.path.abspath(os.path.join(directory, name))
    ckpt = {
        "epoch": epoch,
        "batch_size": batch_size,
        "model_state": _as_numpy(params),
        "optim_state": _as_numpy(opt_state),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, ckpt, force=True)
    ckptr.wait_until_finished()
    return path


def save_weights(directory: str, params: Dict[str, Any], suffix: str = "") -> None:
    """Per-network weight snapshots (AdaFormer/ViT_C/ViT_S[{suffix}])."""
    names = {"adaFormer": "AdaFormer", "vit_c": "ViT_C", "vit_s": "ViT_S"}
    ckptr = ocp.StandardCheckpointer()
    for key, fname in names.items():
        path = os.path.abspath(os.path.join(directory, fname + suffix))
        ckptr.save(path, _as_numpy(params[key]), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: Optional[Dict] = None) -> Dict[str, Any]:
    """Restore a combined checkpoint (orbax dir) or a reference .pth file."""
    if os.path.isfile(path) and path.endswith(".pth"):
        from ..interop import (
            load_pth,
            import_vit,
            import_adaformer,
        )

        raw = load_pth(path)
        return {
            "epoch": raw.get("epoch"),
            "batch_size": raw.get("batch_size"),
            "model_state": {
                "adaFormer": import_adaformer(raw["model_state"]["adaFormer"]),
                "vit_c": import_vit(raw["model_state"]["vit_c"]),
                "vit_s": import_vit(raw["model_state"]["vit_s"]),
            },
            # torch Adam state is not importable into optax; restart optim.
            "optim_state": None,
        }
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def latest_checkpoint(directory: str, batch_size: int) -> Optional[str]:
    """Auto-resume: newest checkpoint_epoch_*_batchSize_{B} under directory."""
    if not os.path.isdir(directory):
        return None
    best = None
    best_epoch = -1
    for name in os.listdir(directory):
        parts = name.split("_")
        if (
            name.startswith("checkpoint_epoch_")
            and name.endswith(f"batchSize_{batch_size}")
            and len(parts) >= 3
        ):
            try:
                epoch = int(parts[2])
            except ValueError:
                continue
            if epoch > best_epoch:
                best_epoch = epoch
                best = os.path.join(directory, name)
    return best
