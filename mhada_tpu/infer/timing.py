"""Latency harness (reference infer_time.py:64-87, fixed).

The reference times 100 un-warmed runs with per-run CUDA events and
recomputes the style features every run.  This harness reports BOTH:

- ``reference_protocol``: style recomputed per run, mean of N timed runs
  (comparable to infer_time.py's number), and
- ``steady_state``: warmed, style-amortised per-frame latency with a single
  sync fence (the honest TPU number; per-run host syncs over the axon tunnel
  measure the tunnel, not the chip).

Prints a JSON dict with both plus p50.
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def measure(params, models, image_size=(512, 512), dtype=jnp.float32,
            iters: int = 100, warmup: int = 5):
    from .image import (
        make_stylize_fn,
        make_encode_style_fn,
        make_stylize_with_kv_fn,
        precompute_style_kv,
    )

    rng = np.random.default_rng(0)
    h, w = image_size
    cs = [jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)), jnp.float32)
          for _ in range(4)]
    style = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)), jnp.float32)

    base_full = make_stylize_fn(models, dtype)
    encode = make_encode_style_fn(models, dtype)
    base_kv = make_stylize_with_kv_fn(models, dtype)

    @jax.jit
    def full(p, c, s):
        return jnp.sum(base_full(p, c, s))

    @jax.jit
    def with_kv(p, c, kv):
        return jnp.sum(base_kv(p, c, kv))

    # warmup / compile
    for i in range(warmup):
        r = full(params, cs[i % 4], style)
    _ = float(r)

    # reference protocol: full forward incl. style encode, per-run mean
    t0 = time.perf_counter()
    for i in range(iters):
        r = full(params, cs[i % 4], style)
    _ = float(r)
    ref_ms = (time.perf_counter() - t0) / iters * 1000

    # steady state: all style-only work amortised (features + MHAda K/V)
    kv = precompute_style_kv(models, params, encode(params, style))
    for i in range(warmup):
        r = with_kv(params, cs[i % 4], kv)
    _ = float(r)
    lat = []
    chunk = 10
    for start in range(0, iters, chunk):
        t0 = time.perf_counter()
        for i in range(start, start + chunk):
            r = with_kv(params, cs[i % 4], kv)
        _ = float(r)
        lat.append((time.perf_counter() - t0) / chunk * 1000)
    lat = np.asarray(lat)
    return {
        "image_size": list(image_size),
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        "iters": iters,
        "reference_protocol_ms": round(ref_ms, 3),
        "steady_state_ms": round(float(lat.mean()), 3),
        "steady_state_p50_ms": round(float(np.median(lat)), 3),
        "fps": round(1000.0 / float(lat.mean()), 2),
    }


def main(argv=None):
    from ..config import ModelConfig
    from ..train.train_image import build_models
    from .image import init_inference_params, load_ckpt_params, default_attn_mode

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, nargs=2, default=(512, 512))
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--ada")
    ap.add_argument("--vitc")
    ap.add_argument("--vits")
    args = ap.parse_args(argv)

    models = build_models(
        ModelConfig(attn_mode=default_attn_mode(args.ada))
    )
    if args.ada:
        params = load_ckpt_params(args.ada, args.vitc, args.vits)
    else:
        params = init_inference_params(models, jax.random.PRNGKey(0))
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    print(json.dumps(measure(params, models, tuple(args.size), dtype,
                             args.iters)))


if __name__ == "__main__":
    main()
