"""On-chip A/B + parity of the wide transposed streaming attention kernel
(ops/attention_pallas.py::attention_stream_wide) vs the head-major
streaming kernel at the 1024^2 ViT shape (N = M = 16384, C = 512, bf16).

The head-major kernel's P@V output is 64 lanes wide (half the MXU's 128
columns idle); the wide kernel accumulates O^T so P@V runs at full width.
Also sweeps the wide kernel's (tn, tm) tiles.

Run: python scripts/wide_probe.py [--iters 10]
"""

import argparse
import math
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
    from mhada_tpu.ops import attention_pallas as AP
    from mhada_tpu.utils.device import commit_to_device

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--n", type=int, default=16384)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    B, H, D = 1, 8, 64
    C = H * D
    n = args.n
    scale = 1.0 / math.sqrt(D)

    qkv = commit_to_device(
        jnp.asarray(rng.standard_normal((B, n, 3 * C)) * 0.5, dt))
    q, k, v = (t.reshape(B, n, H, D).transpose(0, 2, 1, 3)
               for t in jnp.split(qkv, 3, axis=-1))
    q, k, v = map(commit_to_device, (q, k, v))

    gf = 2 * B * H * n * n * D * 2 / 1e9

    hm = jax.jit(lambda q, k, v: AP.attention_pallas(q, k, v, scale))
    dt_hm = timeit(hm, q, k, v, iters=args.iters)
    print(f"head-major stream (512,2048): {dt_hm*1e3:8.2f} ms "
          f"{gf/dt_hm/1e3:6.1f} TF/s", flush=True)

    ref = np.asarray(hm(q, k, v), jnp.float32)  # (B, H, n, D)
    ref = ref.transpose(0, 2, 1, 3).reshape(B, n, C)

    # round-5 additions: the mxu_probe found a ~15 us/grid-step floor at
    # these block sizes — larger tm (fewer key-block steps) tests whether
    # the kernel is per-step-overhead-bound.  tm % tn == 0 required.
    for tn, tm in ((512, 2048), (256, 2048), (512, 4096), (1024, 2048),
                   (256, 4096), (512, 1024), (512, 8192), (1024, 4096),
                   (1024, 8192), (2048, 4096)):
        wide = jax.jit(lambda qkv, tn=tn, tm=tm: AP.attention_stream_wide(
            qkv, scale, H, block_n=tn, block_m=tm))
        try:
            dt_w = timeit(wide, qkv, iters=args.iters)
        except Exception as e:  # noqa: BLE001 — VMEM overflow tiles
            print(f"wide ({tn},{tm}): FAILED {type(e).__name__}", flush=True)
            continue
        got = np.asarray(wide(qkv), jnp.float32)
        err = float(np.max(np.abs(got - ref)))
        print(f"wide ({tn:4d},{tm:5d}): {dt_w*1e3:8.2f} ms "
              f"{gf/dt_w/1e3:6.1f} TF/s  max|err| vs head-major {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
