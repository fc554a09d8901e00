"""How much do the head-split transposes around the training attention
kernels actually cost at the training shape (B=8, N=M=1024, C=512, bf16)?

Decides whether a token-major differentiable kernel (the round-5 candidate
for the ViT/MHAda sweep shares) is worth building: it would remove, per
attention site, the XLA split/transpose of (B, N, 3C) -> 3x(B, H, N, d) in
the forward and its autodiff mirror in the backward.  This probe measures
exactly that delta, interleaved:

  A: grad of  sum(merge(kernel(split(qkv))))   w.r.t. qkv   (today's path)
  B: grad of  sum(kernel(q, k, v))             w.r.t. q,k,v (kernel only)
  T: the bare split+merge round trip fwd-only

A - B ~= the per-site glue a tm VJP could save (kernel time identical).

Run: python scripts/glue_probe.py [--iters 20] [--rounds 5]
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
    from mhada_tpu.ops.attention_pallas import attention_pallas
    from mhada_tpu.utils.device import commit_to_device

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    B, H, N, C = 8, 8, 1024, 512
    d = C // H
    scale = 1.0 / math.sqrt(d)
    dt = jnp.bfloat16

    qkv = commit_to_device(
        jnp.asarray(rng.standard_normal((B, N, 3 * C)) * 0.5, dt))

    def split(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return tuple(
            t.reshape(B, N, H, d).transpose(0, 2, 1, 3) for t in (q, k, v))

    q, k, v = (commit_to_device(t) for t in jax.jit(split)(qkv))

    def site_full(qkv):
        q, k, v = split(qkv)
        o = attention_pallas(q, k, v, scale)
        return jnp.sum(o.transpose(0, 2, 1, 3).reshape(B, N, C))

    def site_kernel(q, k, v):
        return jnp.sum(attention_pallas(q, k, v, scale))

    variants = {
        "grad_full": (jax.jit(jax.grad(site_full)), (qkv,)),
        "grad_kern": (jax.jit(jax.grad(site_kernel, argnums=(0, 1, 2))),
                      (q, k, v)),
        "fwd_full": (jax.jit(lambda qkv: split(qkv)[0]
                             .transpose(0, 2, 1, 3).reshape(B, N, d * H)),
                     (qkv,)),
    }

    live = {}
    for name, (fn, a) in variants.items():
        fn(*a)
        live[name] = (fn, a)

    results = {name: [] for name in live}
    for r in range(args.rounds):
        for name, (fn, a) in live.items():
            results[name].append(timeit(fn, *a, iters=args.iters))
        print(f"round {r}: " + "  ".join(
            f"{n}={results[n][-1] * 1e3:.2f}" for n in live), flush=True)

    print("\nmedians (ms):")
    meds = {}
    for name, ts in results.items():
        ts = sorted(ts)
        meds[name] = ts[len(ts) // 2]
        print(f"  {name}: {meds[name] * 1e3:7.2f}   "
              f"(min {ts[0] * 1e3:.2f}, max {ts[-1] * 1e3:.2f})")
    print(f"\nper-site glue (grad_full - grad_kern): "
          f"{(meds['grad_full'] - meds['grad_kern']) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
