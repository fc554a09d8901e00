"""Tile sweep for the flash-style streaming FORWARD kernels at the
1024^2 shapes (N=16384 query tokens; M=16384 full-res style / M=4096
512^2-style KV), bf16 — the fps_1024 cost center (PERF.md).

Defaults are (512, 2048) from the round-2 sweep at (256,512)-vs-(512,2048)
granularity; this sweeps around them with per-variant VMEM failures
tolerated.

Run: python scripts/stream_tile_probe.py [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    from mhada_tpu.ops import mhada_pallas as MP
    from mhada_tpu.ops import attention_pallas as AP
    from mhada_tpu.utils.device import commit_to_device

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    B, H, D = 1, 8, 64

    def mk(*shape):
        return commit_to_device(
            jnp.asarray(rng.standard_normal(shape) * 0.5, dt))

    tiles = ((512, 2048), (512, 4096), (256, 4096), (1024, 2048),
             (256, 2048), (512, 8192))

    for m in (16384, 4096):
        n = 16384
        q, fn_ = mk(B, H, n, D), mk(B, H, n, D)
        k, v = mk(B, H, m, D), mk(B, H, m, D)
        gf = 2 * B * H * n * m * D * 3 / 1e9
        print(f"MHAda streaming fwd N={n} M={m}:", flush=True)
        for tn, tm in tiles:
            f = jax.jit(lambda q, k, v, fn__, tn=tn, tm=tm:
                        MP._mhada_stream_fwd_impl(
                            q, k, v, fn__, tn, tm, with_res=False))
            try:
                t = timeit(f, q, k, v, fn_, iters=args.iters)
            except Exception as e:
                print(f"  ({tn:4d},{tm:5d}): FAILED {str(e)[:70]}")
                continue
            print(f"  ({tn:4d},{tm:5d}): {t * 1e3:8.2f} ms "
                  f"{gf / t / 1e3:6.1f} TF/s", flush=True)

    n = m = 16384
    q, k, v = mk(B, H, n, D), mk(B, H, m, D), mk(B, H, m, D)
    gf = 2 * B * H * n * m * D * 2 / 1e9
    print(f"ViT attention streaming fwd N=M={n}:", flush=True)
    for tn, tm in tiles:
        f = jax.jit(lambda q, k, v, tn=tn, tm=tm:
                    AP._attn_stream_fwd_impl(
                        q, k, v, 1.0 / np.sqrt(D), tn, tm, with_res=False))
        try:
            t = timeit(f, q, k, v, iters=args.iters)
        except Exception as e:
            print(f"  ({tn:4d},{tm:5d}): FAILED {str(e)[:70]}")
            continue
        print(f"  ({tn:4d},{tm:5d}): {t * 1e3:8.2f} ms "
              f"{gf / t / 1e3:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
