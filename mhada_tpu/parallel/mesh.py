"""Device mesh + sharding layer (TPU-new capability — the reference is
single-GPU with no distributed code, SURVEY.md §5).

Design: a 2D ``Mesh(('data', 'model'))`` over ICI.

- **data**:  batch-axis data parallelism — gradients psum over ICI
  automatically under jit.
- **model**: tensor parallelism over the attention-head / MLP-hidden axes of
  the ViT encoder blocks and the MHAda head stacks (8 heads divide evenly).

Parameters not matching a TP rule are replicated.  XLA inserts the
collectives; shardings are expressed as ``NamedSharding`` constraints so the
same step function runs on 1 chip (trivial mesh) or a pod slice unchanged.
"""

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, f"{n_data}x{n_model} != {n} devices"
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place host arrays with batch-axis sharding over 'data'."""

    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


# (path regex, spec) — first match wins. Paths are '/'-joined param paths.
_TP_RULES = [
    # ViT attention: packed qkv (E, 3E) -> shard the head-parallel 3E axis.
    (re.compile(r".*attention/qkv_kernel$"), P(None, "model")),
    (re.compile(r".*attention/qkv_bias$"), P("model")),
    # attention out-projection consumes the sharded head axis.
    (re.compile(r".*attention/out_proj/kernel$"), P("model", None)),
    # ViT MLP: hidden axis sharded.
    (re.compile(r".*mlp_fc1/kernel$"), P(None, "model")),
    (re.compile(r".*mlp_fc1/bias$"), P("model")),
    (re.compile(r".*mlp_fc2/kernel$"), P("model", None)),
    # MHAda per-head (heads, d, d) stacks: shard the head axis.
    (re.compile(r".*/(f|g|h)_kernel$"), P("model", None, None)),
    (re.compile(r".*/(f|g|h)_bias$"), P("model", None)),
]


def param_sharding_rules(path: str) -> P:
    for rx, spec in _TP_RULES:
        if rx.match(path):
            return spec
    return P()


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Apply TP rules (head/MLP axes over 'model'), replicate the rest."""

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {
                k: rebuild(v, f"{prefix}/{k}" if prefix else k)
                for k, v in tree.items()
            }
        spec = param_sharding_rules(prefix)
        if any(s is not None for s in spec) and mesh.shape["model"] == 1:
            spec = P()  # degenerate TP axis: just replicate
        return jax.device_put(tree, NamedSharding(mesh, spec))

    return rebuild(params)
