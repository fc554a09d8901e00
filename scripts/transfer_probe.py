"""Axon tunnel transfer bandwidth + transcode chunk-size A/B.

Attributes the gap between the device-resident headline fps and the
sustained end-to-end transcode fps (bench.py): every H2D frame upload and
D2H readback crosses the axon tunnel, whose bandwidth this measures
directly.  Also A/Bs the in-graph chunk size (frames per dispatch).

Run: python scripts/transfer_probe.py [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from mhada_tpu.config import ModelConfig
    from mhada_tpu.train.train_image import build_models
    from mhada_tpu.infer.image import (
        init_inference_params, make_encode_style_fn,
        make_stylize_with_kv_fn, precompute_style_kv,
    )
    from mhada_tpu.utils.device import commit_to_device

    # --- tunnel bandwidth ---
    mb = 24
    x_np = np.random.default_rng(0).standard_normal(
        (mb * 1024 * 1024 // 4,)).astype(np.float32)
    dev = jax.devices()[0]

    t0 = time.perf_counter()
    for _ in range(3):
        xd = jax.device_put(x_np, dev)
        _ = float(jnp.sum(xd))  # force the ship + a readback sync
    h2d = 3 * mb / (time.perf_counter() - t0)

    xd = commit_to_device(jnp.asarray(x_np))
    _ = float(jnp.sum(xd))
    t0 = time.perf_counter()
    for _ in range(3):
        _ = np.asarray(xd)
    d2h = 3 * mb / (time.perf_counter() - t0)
    print(f"tunnel: H2D ~{h2d:.1f} MB/s, D2H ~{d2h:.1f} MB/s", flush=True)

    # --- chunk-size A/B on the streaming path (device-resident inputs) ---
    dtype = jnp.bfloat16
    models = build_models(ModelConfig())
    params = init_inference_params(models, jax.random.PRNGKey(0))
    encode = make_encode_style_fn(models, dtype)
    base_kv = make_stylize_with_kv_fn(models, dtype)

    @jax.jit
    def stylize_chunk(params, frames, kv):
        return jnp.sum(base_kv(params, frames, kv))

    rng = np.random.default_rng(0)
    style = commit_to_device(
        jnp.asarray(rng.uniform(0, 255, (1, 512, 512, 3)), jnp.float32))
    kv1 = precompute_style_kv(models, params, encode(params, style))

    for chunk in (8, 16, 32):
        kv = commit_to_device([
            (jnp.tile(k, (chunk, 1, 1)), jnp.tile(v, (chunk, 1, 1)))
            for k, v in kv1
        ])
        frames = commit_to_device(jnp.asarray(
            rng.uniform(0, 255, (chunk, 512, 512, 3)), jnp.float32))
        s = stylize_chunk(params, frames, kv)
        _ = float(s)
        n = max(1, 64 // chunk)
        best = []
        for _w in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                s = stylize_chunk(params, frames, kv)
            _ = float(s)
            best.append(n * chunk / (time.perf_counter() - t0))
        print(f"chunk {chunk:2d}: {np.median(best):7.2f} fps "
              f"({1e3 / np.median(best):.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
