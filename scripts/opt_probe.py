"""Optimization experiments probe: conv formulations + kernel block sweeps.

1. Decoder convs as 9 shifted full-MXU matmuls: y = sum_{dy,dx}
   shift(x)[...] @ W[dy,dx]  — each tap is a (H*W, C) @ (C, Cout) dot at
   full contraction depth, vs XLA's conv lowering (6-67 TF/s measured).
2. MHAda / ViT attention kernel block_n sweep at the 512^2 B=8 shape.

Run: python scripts/opt_probe.py [--iters 20]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mhada_tpu.ops.pad_conv import conv2d_reflect, reflect_pad2d
from mhada_tpu.utils.device import commit_to_device


def shift9_conv_reflect(x, w, b):
    """Reflection-padded 3x3 conv as 9 shifted (HW, C) @ (C, Cout) dots."""
    bsz, h, wd, c = x.shape
    xp = reflect_pad2d(x, 1)
    co = w.shape[-1]
    acc = jnp.zeros((bsz, h, wd, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = xp[:, dy:dy + h, dx:dx + wd, :]
            acc = acc + jax.lax.dot_general(
                tap, w[dy, dx],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return (acc + b).astype(x.dtype)


def timeit(fn, *args, iters=20, warm=2):
    for _ in range(warm):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    it = args.iters
    B = 8
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    stages = [
        ("up1 64^2 512->256", 64, 64, 512, 256),
        ("c1-3 128^2 256->256", 128, 128, 256, 256),
        ("up2 128^2 256->128", 128, 128, 256, 128),
        ("c4 256^2 128->128", 256, 256, 128, 128),
        ("up3 256^2 128->64", 256, 256, 128, 64),
        ("c5 512^2 64->64", 512, 512, 64, 64),
        ("c6 512^2 64->3", 512, 512, 64, 3),
    ]
    print(f"conv formulations, B={B} bf16 (ms/frame)", flush=True)
    for name, h, w, ci, co in stages:
        x = commit_to_device(jnp.asarray(
            rng.standard_normal((B, h, w, ci)) * 0.1, dt))
        wk = commit_to_device(jnp.asarray(
            rng.standard_normal((3, 3, ci, co)) * 0.05, dt))
        bk = commit_to_device(jnp.asarray(rng.standard_normal((co,)), dt))
        f_conv = jax.jit(lambda x, w, b: jnp.maximum(
            conv2d_reflect(x, w, b), 0))
        f_s9 = jax.jit(lambda x, w, b: jnp.maximum(
            shift9_conv_reflect(x, w, b), 0))
        t1 = timeit(f_conv, x, wk, bk, iters=it)
        t2 = timeit(f_s9, x, wk, bk, iters=it)
        gf = 2 * 9 * h * w * ci * co * B / 1e9
        print(f"{name:24s} conv {t1*1e3/B:6.3f} ({gf/t1/1e3:5.1f} TF/s) "
              f"shift9 {t2*1e3/B:6.3f} ({gf/t2/1e3:5.1f} TF/s)", flush=True)

    # kernel block_n sweeps at the production shape
    from mhada_tpu.ops.mhada_pallas import mhada_attention_pallas
    from mhada_tpu.ops.attention_pallas import attention_pallas

    n = m = 4096
    d = 64
    q, k, v, f = (commit_to_device(jnp.asarray(
        rng.standard_normal((B, 8, nn, d)) * 0.35, dt))
        for nn in (n, m, m, n))
    print("MHAda kernel block_n sweep (B=8, H=8, 4096x4096, ms/frame):",
          flush=True)
    for bn in (128, 256, 512, 1024):
        fn = jax.jit(functools.partial(mhada_attention_pallas, block_n=bn))
        t = timeit(fn, q, k, v, f, iters=it)
        gf = 2 * B * 8 * n * m * d * 3 / 1e9
        print(f"  block_n={bn:4d}: {t*1e3/B:6.3f} ms/f ({gf/t/1e3:5.1f} TF/s)",
              flush=True)
    print("ViT attention kernel block_n sweep:", flush=True)
    for bn in (128, 256, 512, 1024):
        fn = jax.jit(functools.partial(
            attention_pallas, scale=0.125, block_n=bn))
        t = timeit(fn, q, k, v, iters=it)
        gf = 2 * B * 8 * n * m * d * 2 / 1e9
        print(f"  block_n={bn:4d}: {t*1e3/B:6.3f} ms/f ({gf/t/1e3:5.1f} TF/s)",
              flush=True)


if __name__ == "__main__":
    main()
