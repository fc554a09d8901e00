"""VGG sweep A/B at the training shape (256^2 B=8 bf16): baseline
VGG19Features vs a column-packed block1/block2 variant (the <=128-channel
convs run at 2C packed channels = MXU width; reuses ops/colpacked.py with
zero padding — VGG convs are zero-padded, reference vgg19.py / torchvision).

VGG is FROZEN in training (no dW): the costs that matter are the forward
sweeps (5 per image step) and dX back through it (3 sweeps on cs/cc/ss).

Run: python scripts/vgg_pack_probe.py [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, *args, iters=10, warm=3):
    for _ in range(warm):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    from mhada_tpu.models import VGG19Features
    from mhada_tpu.models.vgg19 import imagenet_normalize
    from mhada_tpu.ops.colpacked import (
        colpack_conv_weights, space_to_col, col_to_space)
    from mhada_tpu.utils.device import commit_to_device

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    it = args.iters
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    B = 8

    x = commit_to_device(jnp.asarray(
        rng.uniform(0, 255, (B, 256, 256, 3)), dt))
    vgg = VGG19Features()
    params = jax.jit(vgg.init)(
        jax.random.PRNGKey(0), x.astype(jnp.float32))["params"]
    params = commit_to_device(jax.tree.map(lambda p: p.astype(dt), params))

    def base_loss(x, p):
        feats = vgg.apply({"params": p}, x)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats.values())

    def packed_conv_relu_zeropad(xp, w, b):
        wp = colpack_conv_weights(w).astype(xp.dtype)
        xpad = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = lax.conv_general_dilated(
            xpad, wp, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(xp.dtype)
        return jnp.maximum(y + jnp.tile(b.astype(xp.dtype), 2), 0)

    def packed_pool(xp):
        # 2x2 max pool on (B, H, J, 2C): the window's two columns are the
        # packed slots of one column -> slot-max, then row-pair max.
        # Output is the UNPACKED (B, H/2, W/2, C) tensor for free.
        b_, h, j, c2 = xp.shape
        c = c2 // 2
        sm = jnp.maximum(xp[..., :c], xp[..., c:])
        return sm.reshape(b_, h // 2, 2, j, c).max(axis=2)

    def packed_loss(x, p):
        x = imagenet_normalize(x)
        xp = space_to_col(x)
        xp = packed_conv_relu_zeropad(
            xp, p["conv1_1"]["kernel"], p["conv1_1"]["bias"])
        r11 = col_to_space(xp)
        xp = packed_conv_relu_zeropad(
            xp, p["conv1_2"]["kernel"], p["conv1_2"]["bias"])
        x = packed_pool(xp)
        xp = space_to_col(x)
        xp = packed_conv_relu_zeropad(
            xp, p["conv2_1"]["kernel"], p["conv2_1"]["bias"])
        r21 = col_to_space(xp)
        xp = packed_conv_relu_zeropad(
            xp, p["conv2_2"]["kernel"], p["conv2_2"]["bias"])
        x = packed_pool(xp)
        feats = {"relu1_1": r11, "relu2_1": r21}
        from mhada_tpu.models.vgg19 import _VGG19_PREFIX, TAPS
        from mhada_tpu.ops.pad_conv import max_pool2d, conv2d

        for name, ch in _VGG19_PREFIX[6:]:
            if name == "pool":
                x = max_pool2d(x)
            else:
                blk = p[name]
                xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
                x = lax.conv_general_dilated(
                    xpad, blk["kernel"].astype(x.dtype), (1, 1),
                    [(0, 0), (0, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ).astype(x.dtype) + blk["bias"].astype(x.dtype)
                x = jnp.maximum(x, 0)
                if name in TAPS:
                    feats[TAPS[name]] = x
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats.values())

    # parity check first (cheap shapes would recompile; reuse full shape,
    # f32 for a meaningful bound)
    xf = x.astype(jnp.float32)
    pf = jax.tree.map(lambda q: q.astype(jnp.float32), params)
    lb = jax.jit(base_loss)(xf, pf)
    lp = jax.jit(packed_loss)(xf, pf)
    rel = abs(float(lb) - float(lp)) / abs(float(lb))
    print(f"packed-vs-base f32 loss rel err: {rel:.2e}", flush=True)
    assert rel < 1e-5, rel

    t = timeit(jax.jit(base_loss), x, params, iters=it)
    print(f"vgg base   fwd:    {t*1e3:6.2f} ms", flush=True)
    t = timeit(jax.jit(jax.grad(base_loss, argnums=0)), x, params, iters=it)
    print(f"vgg base   fwd+dX: {t*1e3:6.2f} ms", flush=True)
    t = timeit(jax.jit(packed_loss), x, params, iters=it)
    print(f"vgg packed fwd:    {t*1e3:6.2f} ms", flush=True)
    t = timeit(jax.jit(jax.grad(packed_loss, argnums=0)), x, params, iters=it)
    print(f"vgg packed fwd+dX: {t*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
