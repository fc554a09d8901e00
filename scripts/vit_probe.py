"""ViT encoder component micro-probe on the real TPU.

Times each piece of the 512^2 encoder block in isolation at the batched
inference shape (B=8, N=4096, C=512, bf16) and sums them against the whole
block / whole encoder, to locate non-roofline slack.

Usage: python scripts/vit_probe.py [--iters 30] [--batch 8]
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

from mhada_tpu.utils.device import commit_to_device
from mhada_tpu.ops.attention_pallas import attention_pallas


def timeit(fn, *args, iters=30):
    out = fn(*args)
    _ = float(jnp.sum(out[-1].astype(jnp.float32) if isinstance(out, tuple)
                      else out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out[-1].astype(jnp.float32) if isinstance(out, tuple)
                      else out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    B, N, C, H = args.batch, 4096, 512, 8
    d = C // H
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    it = args.iters

    x = commit_to_device(jnp.asarray(rng.standard_normal((B, N, C)) * 0.1, dt))
    wqkv = commit_to_device(jnp.asarray(
        rng.standard_normal((C, 3 * C)) * 0.02, dt))
    w1 = commit_to_device(jnp.asarray(
        rng.standard_normal((C, 2048)) * 0.02, dt))
    w2 = commit_to_device(jnp.asarray(
        rng.standard_normal((2048, C)) * 0.02, dt))
    wo = commit_to_device(jnp.asarray(rng.standard_normal((C, C)) * 0.02, dt))
    qh = commit_to_device(jnp.asarray(
        rng.standard_normal((B, H, N, d)) * 0.1, dt))

    def ln(x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)

    pieces = {
        "ln x2": jax.jit(lambda x: ln(ln(x))),
        "qkv matmul": jax.jit(lambda x: x @ wqkv),
        "split+heads (3 transposes)": jax.jit(lambda x: sum(
            t.reshape(B, N, H, d).transpose(0, 2, 1, 3).astype(jnp.float32).sum()
            for t in jnp.split(x @ wqkv, 3, axis=-1))),
        "attn kernel": jax.jit(
            lambda q: attention_pallas(q, q, q, scale=1.0 / math.sqrt(d))),
        "merge+out_proj": jax.jit(
            lambda q: q.transpose(0, 2, 1, 3).reshape(B, N, C) @ wo),
        "mlp (relu between)": jax.jit(
            lambda x: jnp.maximum(x @ w1, 0) @ w2),
        "residual adds x2": jax.jit(lambda x: x + x + x),
    }
    for name, fn in pieces.items():
        arg = qh if "kernel" in name or "merge" in name else x
        t = timeit(fn, arg, iters=it)
        print(f"{name:28s} {t*1e3/B:6.3f} ms/frame", flush=True)

    # whole block via the real flax module (init on CPU, commit explicitly —
    # a CPU-device arg poisons the jit backend choice)
    from mhada_tpu.models.vit import EncoderBlock, VisionTransformer
    blk = EncoderBlock(num_heads=H, mlp_dim=2048, use_pallas=True)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        bp = jax.jit(blk.init, backend="cpu")(
            jax.random.PRNGKey(0), jnp.zeros((1, N, C), dt))
    bp = commit_to_device(jax.device_put(bp, jax.devices()[0]))
    f_blk = jax.jit(lambda p, x: blk.apply(p, x))
    t = timeit(f_blk, bp, x, iters=it)
    print(f"{'EncoderBlock (whole)':28s} {t*1e3/B:6.3f} ms/frame", flush=True)

    img = commit_to_device(jnp.asarray(
        rng.uniform(0, 255, (B, 512, 512, 3)), jnp.float32))
    vit = VisionTransformer(use_pallas=True)
    with jax.default_device(cpu):
        vp = jax.jit(vit.init, backend="cpu")(jax.random.PRNGKey(0),
                                              jnp.zeros((1, 64, 64, 3)))
    vp = commit_to_device(jax.device_put(vp, jax.devices()[0]))

    @jax.jit
    def f_vit(p, img):
        return vit.apply(p, img.astype(dt))[-1]

    t = timeit(f_vit, vp, img, iters=it)
    print(f"{'VisionTransformer (whole)':28s} {t*1e3/B:6.3f} ms/frame",
          flush=True)


if __name__ == "__main__":
    main()
