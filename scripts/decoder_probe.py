"""Per-stage decoder micro-probe on the real TPU.

Times each decoder conv stage in isolation (jit per stage, queue-N +
single-readback protocol — see bench.py) and compares formulations:

- XLA ``conv_general_dilated`` (current path, ops/pad_conv.py)
- im2row matmul: 3 row-shifted slices concatenated channel-wise, then a
  (H*W, 3*3*C) x (9C, Cout) dot — tests whether XLA's conv lowering or its
  matmul path wins at each (resolution, channels) point.

Usage: python scripts/decoder_probe.py [--iters 30] [--batch 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mhada_tpu.ops.pad_conv import conv2d_reflect, reflect_pad2d
from mhada_tpu.utils.device import commit_to_device


def im2row_conv_reflect(x, w, b):
    """3x3 reflection-padded conv as one matmul over 9C-concatenated taps."""
    bsz, h, wd, c = x.shape
    xp = reflect_pad2d(x, 1)
    rows = []
    for dy in range(3):
        for dx in range(3):
            rows.append(xp[:, dy:dy + h, dx:dx + wd, :])
    patches = jnp.concatenate(rows, axis=-1)  # (B, H, W, 9C)
    wm = w.transpose(0, 1, 2, 3).reshape(9 * c, -1)
    y = patches.reshape(bsz * h * wd, 9 * c) @ wm.astype(x.dtype)
    return (y + b.astype(x.dtype)).reshape(bsz, h, wd, -1)


def timeit(fn, *args, iters=30):
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    B = args.batch
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    # (name, H, W, Cin, Cout) of every decoder conv at 512^2 inference
    stages = [
        ("up1 64^2 512->256", 64, 64, 512, 256),
        ("c1-3 128^2 256->256", 128, 128, 256, 256),
        ("up2 128^2 256->128", 128, 128, 256, 128),
        ("c4 256^2 128->128", 256, 256, 128, 128),
        ("up3 256^2 128->64", 256, 256, 128, 64),
        ("c5 512^2 64->64", 512, 512, 64, 64),
        ("c6 512^2 64->3", 512, 512, 64, 3),
    ]

    print(f"B={B} dtype=bf16  (per-frame ms = ms/call / B)", flush=True)
    for name, h, w, ci, co in stages:
        x = commit_to_device(jnp.asarray(
            rng.standard_normal((B, h, w, ci)) * 0.1, dt))
        wk = commit_to_device(jnp.asarray(
            rng.standard_normal((3, 3, ci, co)) * 0.05, dt))
        bk = commit_to_device(jnp.asarray(rng.standard_normal((co,)), dt))
        f_conv = jax.jit(lambda x, w, b: jnp.maximum(
            conv2d_reflect(x, w, b), 0))
        f_mm = jax.jit(lambda x, w, b: jnp.maximum(
            im2row_conv_reflect(x, w, b), 0))
        t1 = timeit(f_conv, x, wk, bk, iters=args.iters)
        t2 = timeit(f_mm, x, wk, bk, iters=args.iters)
        gf = 2 * 9 * h * w * ci * co * B / 1e9
        print(f"{name:24s} conv {t1*1e3/B:6.3f} ms/f ({gf/t1/1e3:5.1f} "
              f"TF/s)   im2row {t2*1e3/B:6.3f} ms/f ({gf/t2/1e3:5.1f} TF/s)",
              flush=True)


if __name__ == "__main__":
    main()
