"""Tile sweep for the flash-style attention BACKWARD kernels at the
training shape (B=8, h=8, N=M=1024, d=64, bf16 — 256^2 recipe tokens).

The VJPs clamp backward tiles to (256, 512) ("fits regardless" sizes,
ops/{mhada,attention}_pallas.py).  This measures whether bigger tiles pay
at the recipe shape, calling the bwd impls directly.

Run: python scripts/bwd_tile_probe.py [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warm=2):
    for _ in range(warm):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    from mhada_tpu.ops import attention_pallas as AP
    from mhada_tpu.ops import mhada_pallas as MP
    from mhada_tpu.utils.device import commit_to_device

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    B, H, N, D = 8, 8, 1024, 64
    dt = jnp.bfloat16

    def mk(*shape):
        return commit_to_device(
            jnp.asarray(rng.standard_normal(shape) * 0.5, dt))

    q, k, v, g = mk(B, H, N, D), mk(B, H, N, D), mk(B, H, N, D), \
        mk(B, H, N, D)
    scale = 1.0 / np.sqrt(D)

    # forward residuals once (what the VJP saves)
    out, lse = jax.jit(lambda q, k, v: AP._attn_stream_fwd_impl(
        q, k, v, scale, 256, 1024, with_res=True))(q, k, v)
    out, lse = commit_to_device(out), commit_to_device(lse)

    print("ViT attention bwd (dq + dkv kernels):", flush=True)
    for tn, tm in ((256, 512), (256, 1024), (512, 512), (512, 1024),
                   (128, 1024), (1024, 1024)):
        fn = jax.jit(lambda q, k, v, out, lse, g, tn=tn, tm=tm:
                     AP._attn_stream_bwd_impl(
                         q, k, v, out, lse, g, scale, tn, tm))
        try:
            t = timeit(fn, q, k, v, out, lse, g, iters=args.iters)
        except Exception as e:
            print(f"  ({tn:4d},{tm:4d}): FAILED {str(e)[:80]}")
            continue
        print(f"  ({tn:4d},{tm:4d}): {t * 1e6:8.0f} us", flush=True)

    fcs_n = mk(B, H, N, D)
    g2 = mk(B, H, N, D)
    out2, m1e2, lse2 = jax.jit(lambda q, k, v, f: MP._mhada_stream_fwd_impl(
        q, k, v, f, 256, 1024, with_res=True))(q, k, v, fcs_n)
    m1e2, lse2 = commit_to_device(m1e2), commit_to_device(lse2)

    print("MHAda bwd (dq + dkv kernels):", flush=True)
    for tn, tm in ((256, 512), (256, 1024), (512, 512), (512, 1024),
                   (128, 1024), (1024, 1024)):
        fn = jax.jit(lambda q, k, v, f, m1e2, lse, g, tn=tn, tm=tm:
                     MP._mhada_stream_bwd_impl(
                         q, k, v, f, m1e2, lse, g, tn, tm))
        try:
            t = timeit(fn, q, k, v, fcs_n, m1e2, lse2, g2, iters=args.iters)
        except Exception as e:
            print(f"  ({tn:4d},{tm:4d}): FAILED {str(e)[:80]}")
            continue
        print(f"  ({tn:4d},{tm:4d}): {t * 1e6:8.0f} us", flush=True)


if __name__ == "__main__":
    main()
