"""Training-decoder backward attribution at the recipe shape (256^2 B=8
bf16, fcs (8, 32, 32, 512)): fwd-only vs fwd+dX vs fwd+dX+dW for the col
decoder, plus a per-stage-group split (mid c1..c4 vs packed tail) — where
do the 13.6 ms of decoder fwd+bwd (PERF.md round-3 attribution) sit?

Run: python scripts/decoder_bwd_probe.py [--iters 10]
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
    from mhada_tpu.models import Decoder
    from mhada_tpu.utils.device import commit_to_device

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    B = 8

    fcs = commit_to_device(jnp.asarray(
        rng.standard_normal((B, 32, 32, 512)) * 0.5, dt))
    dec = Decoder(packed="col")
    params = jax.jit(dec.init)(
        jax.random.PRNGKey(1), fcs.astype(jnp.float32))["params"]
    params = commit_to_device(jax.tree.map(lambda x: x.astype(dt), params))

    def loss(p, x):
        return jnp.sum(dec.apply({"params": p}, x).astype(jnp.float32))

    fwd = jax.jit(loss)
    gx = jax.jit(jax.grad(loss, argnums=1))          # dX only
    gpx = jax.jit(jax.grad(loss, argnums=(0, 1)))    # dW + dX

    t_f0 = timeit(fwd, params, fcs, iters=args.iters)
    t_gx = timeit(gx, params, fcs, iters=args.iters)
    t_gpx = timeit(gpx, params, fcs, iters=args.iters)
    t_f = timeit(fwd, params, fcs, iters=args.iters)  # re-time warm
    print(f"decoder[col] fwd:        {t_f*1e3:7.2f} ms "
          f"(first pass {t_f0*1e3:.2f})", flush=True)
    print(f"decoder[col] fwd+dX:     {t_gx*1e3:7.2f} ms "
          f"(dX ~ {(t_gx-t_f)*1e3:5.2f})", flush=True)
    print(f"decoder[col] fwd+dX+dW:  {t_gpx*1e3:7.2f} ms "
          f"(dW ~ {(t_gpx-t_gx)*1e3:5.2f})", flush=True)

    # stage-group split: the truncated decoder (up1..c4, ends 128^2 x 128)
    # vs full — difference = the packed tail's (up3+c5+c6) fwd+bwd share
    from mhada_tpu.models.decoder import (
        ConvReLU, ConvReluUp)
    import flax.linen as nn

    class _Mid(nn.Module):
        @nn.compact
        def __call__(self, fcs):
            x = ConvReluUp(256, name="up1")(fcs)
            x = ConvReLU(256, name="c1")(x)
            x = ConvReLU(256, name="c2")(x)
            x = ConvReLU(256, name="c3")(x)
            x = ConvReluUp(128, name="up2")(x)
            return ConvReLU(128, name="c4")(x)

    mid = _Mid()
    mid_params = {k: params[k] for k in
                  ("up1", "c1", "c2", "c3", "up2", "c4")}

    def mid_loss(p, x):
        return jnp.sum(mid.apply({"params": p}, x).astype(jnp.float32))

    t_mid_f = timeit(jax.jit(mid_loss), mid_params, fcs, iters=args.iters)
    t_mid_g = timeit(jax.jit(jax.grad(mid_loss, argnums=(0, 1))),
                     mid_params, fcs, iters=args.iters)
    print(f"decoder mid (up1..c4) fwd:       {t_mid_f*1e3:7.2f} ms", flush=True)
    print(f"decoder mid (up1..c4) fwd+bwd:   {t_mid_g*1e3:7.2f} ms", flush=True)
    print(f"=> packed tail (up3+c5+c6) fwd:  {(t_f-t_mid_f)*1e3:7.2f} ms, "
          f"fwd+bwd: {(t_gpx-t_mid_g)*1e3:7.2f} ms", flush=True)

    # unpacked-tail comparison: does the col packing hurt the backward?
    dec_u = Decoder(packed=False)

    def loss_u(p, x):
        return jnp.sum(dec_u.apply({"params": p}, x).astype(jnp.float32))

    t_u_f = timeit(jax.jit(loss_u), params, fcs, iters=args.iters)
    t_u_g = timeit(jax.jit(jax.grad(loss_u, argnums=(0, 1))), params, fcs,
                   iters=args.iters)
    print(f"decoder[unpacked] fwd:     {t_u_f*1e3:7.2f} ms", flush=True)
    print(f"decoder[unpacked] fwd+bwd: {t_u_g*1e3:7.2f} ms", flush=True)

    # f32 dW comparison — is the dW cost a dtype issue?
    params32 = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    fcs32 = commit_to_device(fcs.astype(jnp.float32))
    t32 = timeit(jax.jit(jax.grad(loss, argnums=(0, 1))), params32, fcs32,
                 iters=args.iters)
    print(f"decoder[col] f32 full:   {t32*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
