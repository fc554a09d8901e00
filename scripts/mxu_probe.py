"""MXU shape-quantization micro-probe (v5e): bare Pallas matmul kernels at
the attention tile shapes, VMEM-resident operands (constant index maps, so
HBM traffic amortises away), useful-FLOPs TF/s per shape.

Maps which dims quantize on the MXU: output lanes (n), contraction (k),
streamed rows (m).  Informs the streaming-attention kernel design
(PERF.md round-4: why the transposed P@V did / didn't win).

Run: python scripts/mxu_probe.py [--reps 400] [--iters 8]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def bench_shape(m, k, n, dtype, reps, iters):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)) * 0.1, dtype)
    b = jnp.asarray(rng.standard_normal((k, n)) * 0.1, dtype)
    from mhada_tpu.utils.device import commit_to_device

    a, b = commit_to_device((a, b))

    call = pl.pallas_call(
        _mm_kernel,
        grid=(reps,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    fn = jax.jit(lambda a, b: jnp.sum(call(a, b).astype(jnp.float32)))
    _ = float(fn(a, b))
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(iters):
        s = fn(a, b)
    _ = float(s)
    dt = (time.perf_counter() - t0) / iters
    tf = 2 * m * k * n * reps / dt / 1e12
    print(f"({m:5d},{k:5d}) @ ({k:5d},{n:5d}) {np.dtype(dtype).name:9s}"
          f" {dt/reps*1e6:8.1f} us/mm {tf:7.1f} TF/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=400)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    shapes = [
        # baseline: everything >= 128
        (512, 2048, 512),
        # P@V head-major: half-width output (n = d = 64)
        (512, 2048, 64),
        (512, 2048, 128),
        # P@V transposed (the wide kernel): 64 streamed rows
        (64, 2048, 512),
        (128, 2048, 512),
        (256, 2048, 512),
        # QK: half-depth contraction (k = d = 64)
        (512, 64, 2048),
        (512, 128, 2048),
    ]
    for dtype in (jnp.bfloat16,):
        for m, k, n in shapes:
            bench_shape(m, k, n, dtype, args.reps, args.iters)


if __name__ == "__main__":
    main()
