"""Cumulative in-graph decoder stage attribution at the headline protocol.

Times jits of growing decoder prefixes (up1; up1+c1; ...; full incl clip)
at B=8 bf16 from the real (64, 64, 512) fcs input — deltas give each
stage's cost WITH XLA's in-graph fusion, unlike isolated per-op probes.

Run: python scripts/decoder_stage_probe.py [--iters 20]
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
from mhada_tpu.models.decoder import (
    ConvReLU, ConvReluUp, ConvReluUpPacked, PackedConvReLU,
)
from mhada_tpu.ops.colpacked import col_to_space


def timeit(fn, *args, iters=20, warm=2):
    for _ in range(warm):
        out = fn(*args)
    _ = float(out)
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    it = args.iters
    B = 8
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    x0 = commit_to_device(jnp.asarray(
        rng.standard_normal((B, 64, 64, 512)) * 0.5, dt))

    # stages mirror Decoder(packed="col") exactly
    mods = [
        ("up1", ConvReluUp(256)),
        ("c1", ConvReLU(256)),
        ("c2", ConvReLU(256)),
        ("c3", ConvReLU(256)),
        ("up2", ConvReluUp(128)),
        ("c4", ConvReLU(128)),
        ("up3col", ConvReluUpPacked(64, mode="col")),
        ("c5col", PackedConvReLU(64, mode="col")),
        ("c6col", PackedConvReLU(3, mode="col")),
    ]
    # init + shape chain entirely on CPU: eager ops over the axon tunnel
    # take seconds each (CLAUDE.md)
    params = []
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x = jnp.asarray(jax.device_get(x0))
        for name, m in mods:
            p = jax.jit(m.init, backend="cpu")(
                jax.random.PRNGKey(len(params)), x)
            params.append(p)
            x = jax.jit(m.apply, backend="cpu")(p, x)
    # explicit device_put first: commit_to_device's jitted identity follows
    # the args' placement, so CPU-backed leaves would keep it on CPU
    tpu = jax.devices()[0]
    params = [commit_to_device(jax.device_put(p, tpu)) for p in params]

    prev = 0.0
    for k in range(1, len(mods) + 1):
        def prefix(x0, *ps, _k=k):
            y = x0
            for (name, m), p in zip(mods[:_k], ps):
                y = m.apply(p, y)
            return jnp.sum(y.astype(jnp.float32))

        fn = jax.jit(prefix)
        t = timeit(fn, x0, *params[:k], iters=it)
        print(f"+{mods[k-1][0]:8s} cum {t*1e3/B:6.3f} ms/f "
              f"(stage ~{(t-prev)*1e3/B:6.3f})", flush=True)
        prev = t

    # full incl unpack + clip + f32 cast (the bench epilogue)
    def full(x0, *ps):
        y = x0
        for (name, m), p in zip(mods, ps):
            y = m.apply(p, y)
        y = col_to_space(y)
        return jnp.sum(jnp.clip(y.astype(jnp.float32), 0, 255))

    t = timeit(jax.jit(full), x0, *params, iters=it)
    print(f"+epilogue cum {t*1e3/B:6.3f} ms/f (stage ~{(t-prev)*1e3/B:6.3f})",
          flush=True)


if __name__ == "__main__":
    main()
