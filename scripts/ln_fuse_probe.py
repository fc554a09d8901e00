"""A/B the fused LayerNorm+matmul path (ops/ln_matmul_pallas) on TPU:
vit_c encoder and full streaming pipeline, fuse_ln on vs off, at the
headline protocol (B=8, bf16, 512^2), plus an output-parity check.

Run: python scripts/ln_fuse_probe.py [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warm=3):
    for _ in range(warm):
        out = fn(*args)
    _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from mhada_tpu.config import ModelConfig
    from mhada_tpu.models import VisionTransformer
    from mhada_tpu.train.train_image import build_models
    from mhada_tpu.infer.image import (
        init_inference_params, make_encode_style_fn, precompute_style_kv,
    )
    from mhada_tpu.utils.device import commit_to_device

    dtype = jnp.bfloat16
    cfg = ModelConfig()
    models = build_models(cfg)  # fuse_ln=True in the inference build
    m = cfg
    vit_fused = models["vit_c"]
    vit_plain = VisionTransformer(
        patch_size=m.patch_size, num_layers=m.num_layers,
        num_heads=m.num_heads, hidden_dim=m.hidden_dim,
        mlp_dim=m.mlp_dim, pos_embedding=True, attn_mode=m.attn_mode,
        use_pallas=True, tokmaj=True, fuse_ln=False,
    )

    params = init_inference_params(models, jax.random.PRNGKey(0), (512, 512))
    params = commit_to_device(params)

    rng = np.random.default_rng(0)
    B = 8
    frames = commit_to_device(
        jnp.asarray(rng.uniform(0, 255, (B, 512, 512, 3)), jnp.float32))
    style = commit_to_device(
        jnp.asarray(rng.uniform(0, 255, (1, 512, 512, 3)), jnp.float32))

    fs = make_encode_style_fn(models, dtype)(params, style)
    kv = precompute_style_kv(models, params, fs)
    kv8 = commit_to_device([
        (jnp.tile(k, (B, 1, 1)), jnp.tile(v, (B, 1, 1))) for k, v in kv
    ])

    def vit_only(vit):
        @jax.jit
        def fn(params, c):
            fc = vit.apply({"params": params["vit_c"]}, c.astype(dtype))
            return jnp.sum(fc[-1].astype(jnp.float32))
        return fn

    def vit_out(vit):
        @jax.jit
        def fn(params, c):
            return vit.apply({"params": params["vit_c"]},
                             c.astype(dtype))[-1]
        return fn

    ada = models["adaFormer"]

    def full(vit):
        @jax.jit
        def fn(params, c, kv):
            cd = c.astype(dtype)
            fc = vit.apply({"params": params["vit_c"]}, cd)
            _, cs = ada.apply({"params": params["adaFormer"]}, fc, None,
                              style_kv=kv)
            return jnp.sum(jnp.clip(cs.astype(jnp.float32), 0, 255))
        return fn

    it = args.iters
    # parity first (bf16: expect small rounding-level differences)
    o_f = np.asarray(jax.device_get(
        vit_out(vit_fused)(params, frames)).astype(jnp.float32))
    o_p = np.asarray(jax.device_get(
        vit_out(vit_plain)(params, frames)).astype(jnp.float32))
    d = np.abs(o_f - o_p)
    print(f"vit_c tokens fused-vs-plain: max {d.max():.3e} "
          f"mean {d.mean():.3e} (|tok| mean {np.abs(o_p).mean():.3f})",
          flush=True)

    for name, vit in (("plain", vit_plain), ("fuse_ln", vit_fused)):
        t = timeit(vit_only(vit), params, frames, iters=it)
        print(f"vit_c B=8 {name:8s}: {t*1e3:7.2f} ms/call "
              f"({t/B*1e3:5.2f} ms/frame)", flush=True)
    for name, vit in (("plain", vit_plain), ("fuse_ln", vit_fused)):
        t = timeit(full(vit), params, frames, kv8, iters=it)
        print(f"full  B=8 {name:8s}: {t*1e3:7.2f} ms/call "
              f"({t/B*1e3:5.2f} ms/frame, {B/t:6.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
