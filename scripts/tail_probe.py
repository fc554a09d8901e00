"""A/B the decoder tail: XLA col-packed c5/c6 vs the fused manual-DMA
Pallas kernel, full-decoder timing at the headline protocol (B=8, bf16,
(64, 64, 512) fcs -> 512^2 RGB).

Run: python scripts/tail_probe.py [--iters 30]
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
from mhada_tpu.models.decoder import Decoder


def timeit(fn, *args, iters=30, warm=3):
    for _ in range(warm):
        out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    B = 8
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    x0 = commit_to_device(jnp.asarray(
        rng.standard_normal((B, 64, 64, 512)) * 0.5, dt))

    cpu = jax.devices("cpu")[0]
    ref_dec = Decoder(packed="col")
    with jax.default_device(cpu):
        params = jax.jit(ref_dec.init, backend="cpu")(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 512), jnp.float32))
    params = commit_to_device(jax.device_put(params, jax.devices()[0]))

    results = {}
    outs = {}
    for name, dec in (
        ("col", Decoder(packed="col")),
        ("col_tail", Decoder(packed="col_tail")),
        ("mega", Decoder(packed="mega")),
        ("mega16", Decoder(packed="mega16")),
    ):
        fn = jax.jit(lambda p, x, d=dec: d.apply(p, x))
        try:
            dt_s = timeit(fn, params, x0, iters=args.iters)
        except Exception as e:
            print(f"{name:10s}: FAILED {str(e)[:120]}")
            continue
        outs[name] = np.asarray(jax.device_get(
            fn(params, x0)).astype(jnp.float32))
        results[name] = dt_s
        print(f"{name:10s}: {dt_s * 1e3:7.2f} ms/call "
              f"({dt_s * 1e3 / B:5.2f} ms/frame)")

    for name in outs:
        if name == "col":
            continue
        err = np.abs(outs["col"] - outs[name]).max()
        print(f"max |col - {name}| = {err:.3e}; delta "
              f"{(results['col'] - results[name]) * 1e3 / B:+.3f} "
              f"ms/frame in favour of {name}")


if __name__ == "__main__":
    main()
