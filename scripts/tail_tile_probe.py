"""Isolated decoder-tail probe: XLA col-packed c6 vs the transposed-
stacked Pallas kernel at several row tiles, on the real (B, 512, 256, 128)
c5col output shape.

Run: python scripts/tail_tile_probe.py [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mhada_tpu.utils.device import commit_to_device
from mhada_tpu.ops.colpacked import colpacked_conv_relu, col_to_space
from mhada_tpu.ops.decoder_tail_pallas import c6_transposed


def timeit(fn, *args, iters=30, warm=3):
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
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    B = 8
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    y = commit_to_device(jnp.asarray(
        np.abs(rng.standard_normal((B, 512, 256, 128))) * 0.5, dt))
    w6 = commit_to_device(jnp.asarray(
        rng.standard_normal((3, 3, 64, 3)) * 0.06, dt))
    b6 = commit_to_device(jnp.asarray(rng.standard_normal((3,)), jnp.float32))

    @jax.jit
    def xla_c6(y, w6, b6):
        return col_to_space(colpacked_conv_relu(y, w6, b6.astype(dt)))

    t = timeit(xla_c6, y, w6, b6, iters=args.iters)
    print(f"xla col c6         : {t*1e3:7.2f} ms/call ({t*1e3/B:5.3f} ms/frame)")
    ref = np.asarray(jax.device_get(xla_c6(y, w6, b6))).astype(np.float32)

    for th in (16, 32, 64):
        fn = jax.jit(lambda u, a, b, th=th: c6_transposed(
            u, a, b, row_tile=th))
        try:
            t = timeit(fn, y, w6, b6, iters=args.iters)
        except Exception as e:
            print(f"pallas row_tile={th}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")
            continue
        got = np.asarray(jax.device_get(fn(y, w6, b6))).astype(np.float32)
        err = np.abs(got.reshape(ref.shape) - ref).max()
        print(f"pallas row_tile={th:2d} : {t*1e3:7.2f} ms/call "
              f"({t*1e3/B:5.3f} ms/frame)  maxerr={err:.2e}")


if __name__ == "__main__":
    main()
