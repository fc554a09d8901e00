"""Parameter and FLOP counting (reference count_param.py:12-31,
count_flops_ptflops.py / count_flops_fvcore.py).

Parameters are counted from the pytree; FLOPs come from XLA's own cost
analysis of the jitted computation — the TPU-native equivalent of
ptflops/fvcore, and exact for the compiled graph rather than estimated
per-module.
"""

from typing import Any, Dict

import jax
import numpy as np


def count_params(params: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def count_params_mb(params: Any, bytes_per_param: int = 4) -> float:
    """MB at fp32, matching count_param.py's 4 B/param convention."""
    return count_params(params) * bytes_per_param / (1024**2)


def count_flops(fn, *example_args) -> Dict[str, float]:
    """XLA cost analysis of jit(fn)(*example_args).

    Returns {'flops': ..., 'gflops': ..., 'bytes_accessed': ...} when the
    backend reports them (CPU/TPU both do).
    """
    compiled = jax.jit(fn).lower(*example_args).compile()
    analyses = compiled.cost_analysis()
    ca = analyses[0] if isinstance(analyses, (list, tuple)) else analyses
    flops = float(ca.get("flops", float("nan")))
    return {
        "flops": flops,
        "gflops": flops / 1e9,
        "bytes_accessed": float(ca.get("bytes accessed", float("nan"))),
    }


def report(image_size=(256, 256)) -> Dict[str, Dict]:
    """Per-network params (MB) + GFLOPs at the reference's count shapes:
    ViTs at (3,H,W); AdaFormer at 3x(512, H/8, W/8) feature lists
    (count_flops_fvcore.py:29-54)."""
    import jax.numpy as jnp

    from ..config import ModelConfig
    from ..train.train_image import build_models
    from ..infer.image import init_inference_params

    models = build_models(ModelConfig())
    params = init_inference_params(models, jax.random.PRNGKey(0))
    h, w = image_size
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    feats = [jnp.zeros((1, h // 8, w // 8, 512), jnp.float32)] * 3

    out = {}
    for name, inp in (("vit_c", (x,)), ("vit_s", (x,)),
                      ("adaFormer", (feats, feats))):
        model = models[name]
        p = params[name]
        fl = count_flops(lambda *a: model.apply({"params": p}, *a), *inp)
        out[name] = {
            "params": count_params(p),
            "params_mb": round(count_params_mb(p), 3),
            "gflops": round(fl["gflops"], 3),
        }
    return out


if __name__ == "__main__":
    import json

    print(json.dumps(report(), indent=2))
