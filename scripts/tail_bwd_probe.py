"""Tail backward attribution at the training shape: per-stage fwd / fwd+dX /
fwd+dX+dW for the col-packed decoder tail (up3 stage, c5, c6), isolating
where the ~4.6 ms of tail backward (scripts/decoder_bwd_probe.py round-5:
tail fwd 2.59 / fwd+bwd 7.18 ms at 256^2 B=8 bf16) actually sits.

Run: python scripts/tail_bwd_probe.py [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, warm=3):
    for _ in range(warm):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def report(name, fn_of_params_x, params, x, iters):
    f = jax.jit(fn_of_params_x)
    gx = jax.jit(jax.grad(fn_of_params_x, argnums=1))
    gpx = jax.jit(jax.grad(fn_of_params_x, argnums=(0, 1)))
    t_f = timeit(f, params, x, iters=iters)
    t_gx = timeit(gx, params, x, iters=iters)
    t_gpx = timeit(gpx, params, x, iters=iters)
    print(f"{name:24s} fwd {t_f*1e3:6.2f}  +dX {(t_gx-t_f)*1e3:6.2f}  "
          f"+dW {(t_gpx-t_gx)*1e3:6.2f}  (full {t_gpx*1e3:6.2f} ms)",
          flush=True)
    return t_f, t_gx, t_gpx


def main():
    from mhada_tpu.ops.colpacked import (
        colpacked_conv_relu, space_to_col, col_to_space,
        upsample2x_colpacked, colpack_conv_weights, colpacked_reflect_pad,
    )
    from mhada_tpu.utils.device import commit_to_device

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    it = args.iters
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    B = 8

    def mk(*shape, scale=0.5):
        return commit_to_device(
            jnp.asarray(rng.standard_normal(shape) * scale, dt))

    # training-shape activations (decoder input 32^2 -> c4 out 128^2 x 128)
    x_c4 = mk(B, 128, 128, 128)          # c4 output (up3 stage input)
    u_p = mk(B, 256, 128, 128)           # packed upsampled (c5 input)
    c5_p = mk(B, 256, 128, 128)          # packed c5 output (c6 input)

    w_up = mk(3, 3, 128, 64, scale=0.05)
    b_up = mk(64, scale=0.05)
    w5 = mk(3, 3, 64, 64, scale=0.05)
    b5 = mk(64, scale=0.05)
    w6 = mk(3, 3, 64, 3, scale=0.05)
    b6 = mk(3, scale=0.05)

    def up3_stage(p, x):
        w, b = p
        xp = colpacked_conv_relu(space_to_col(x), w, b)
        return jnp.sum(
            upsample2x_colpacked(col_to_space(xp)).astype(jnp.float32))

    def c5_stage(p, xp):
        w, b = p
        return jnp.sum(colpacked_conv_relu(xp, w, b).astype(jnp.float32))

    def c6_stage(p, xp):
        w, b = p
        return jnp.sum(colpacked_conv_relu(xp, w, b).astype(jnp.float32))

    def tail(p, x):
        w_up, b_up, w5, b5, w6, b6 = p
        xp = colpacked_conv_relu(space_to_col(x), w_up, b_up)
        up = upsample2x_colpacked(col_to_space(xp))  # already packed
        c5o = colpacked_conv_relu(up, w5, b5)
        c6o = colpacked_conv_relu(c5o, w6, b6)
        return jnp.sum(c6o.astype(jnp.float32))

    report("tail (up3+c5+c6)", tail, (w_up, b_up, w5, b5, w6, b6), x_c4, it)
    report("up3 stage (conv+ups)", up3_stage, (w_up, b_up), x_c4, it)
    report("c5 packed 128ch", c5_stage, (w5, b5), u_p, it)
    report("c6 packed ->6ch", c6_stage, (w6, b6), c5_p, it)

    # c6 dW via the stacked-tap transposed matmul: dW = dY^T @ X_taps —
    # output (6, 9*128): m=6 sublanes (pad 8), n full lanes, k = B*H*J.
    # Is this faster than XLA's conv-backprop-filter at n=6 lanes?
    def c6_dw_stacked(xp, dy):
        xpad = colpacked_reflect_pad(xp)
        b, h, j, c2 = xp.shape
        taps = jnp.concatenate(
            [xpad[:, ky:ky + h, kx:kx + j, :]
             for ky in range(3) for kx in range(3)], axis=-1)
        t2 = taps.reshape(b * h * j, 9 * c2)
        d2 = dy.reshape(b * h * j, dy.shape[-1])
        return jax.lax.dot_general(
            d2, t2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (6, 9*2C)

    dy6 = mk(B, 256, 128, 6)
    t = timeit(jax.jit(c6_dw_stacked), c5_p, dy6, iters=it)
    print(f"c6 dW stacked-tap matmul: {t*1e3:6.2f} ms", flush=True)

    # c5 dW the same way: (128, 9*128) output
    def c5_dw_stacked(xp, dy):
        xpad = colpacked_reflect_pad(xp)
        b, h, j, c2 = xp.shape
        taps = jnp.concatenate(
            [xpad[:, ky:ky + h, kx:kx + j, :]
             for ky in range(3) for kx in range(3)], axis=-1)
        t2 = taps.reshape(b * h * j, 9 * c2)
        d2 = dy.reshape(b * h * j, dy.shape[-1])
        return jax.lax.dot_general(
            d2, t2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dy5 = mk(B, 256, 128, 128)
    t = timeit(jax.jit(c5_dw_stacked), u_p, dy5, iters=it)
    print(f"c5 dW stacked-tap matmul: {t*1e3:6.2f} ms", flush=True)

    # c6 dX alone (transposed conv, contraction depth 6)
    def c6_dx(w, xp):
        return jnp.sum(colpacked_conv_relu(xp, w, b6).astype(jnp.float32))

    gx6 = jax.jit(jax.grad(c6_dx, argnums=1))
    t = timeit(gx6, w6, c5_p, iters=it)
    print(f"c6 fwd+dX only:          {t*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
