"""One-process TPU measurement session: stage ablations + packed-decoder
mode comparison on the streaming inference path.

Everything shares one process/backend so compile caches are reused and the
axon tunnel is not contended (CLAUDE.md).  Timing protocol: queue N
dispatches, sync once via a scalar readback.

Run: python scripts/tpu_probe.py [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=30, warm=3):
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--size", type=int, default=512,
                    help="content frame side (style stays 512 — the bench 1024^2 protocol reuses the 512^2 style KV)")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    S = args.size

    from mhada_tpu.config import ModelConfig
    from mhada_tpu.models import AdaFormer
    from mhada_tpu.train.train_image import build_models
    from mhada_tpu.infer.image import (
        init_inference_params, make_encode_style_fn, precompute_style_kv,
    )
    from mhada_tpu.utils.device import commit_to_device

    dtype = jnp.bfloat16
    cfg = ModelConfig()
    models = build_models(cfg)
    params = init_inference_params(models, jax.random.PRNGKey(0), (512, 512))
    params = commit_to_device(params)

    rng = np.random.default_rng(0)
    content = commit_to_device(
        jnp.asarray(rng.uniform(0, 255, (1, S, S, 3)), jnp.float32))
    style = commit_to_device(
        jnp.asarray(rng.uniform(0, 255, (1, 512, 512, 3)), jnp.float32))

    fs = make_encode_style_fn(models, dtype)(params, style)
    kv = precompute_style_kv(models, params, fs)
    kv = commit_to_device(kv)

    vit_c = models["vit_c"]
    ada = models["adaFormer"]
    ada_col = AdaFormer(num_layers=cfg.num_layers, num_heads=cfg.num_heads,
                        activation=cfg.activation, use_pallas=True,
                        packed_decoder="col")
    ada_unpacked = AdaFormer(num_layers=cfg.num_layers,
                             num_heads=cfg.num_heads,
                             activation=cfg.activation, use_pallas=True,
                             packed_decoder=False)
    ada_best = AdaFormer(num_layers=cfg.num_layers, num_heads=cfg.num_heads,
                         activation=cfg.activation, use_pallas=True,
                         packed_decoder="col", fuse_prologue=True)
    ada_tail = AdaFormer(num_layers=cfg.num_layers, num_heads=cfg.num_heads,
                         activation=cfg.activation, use_pallas=True,
                         packed_decoder="col_tail", fuse_prologue=True)

    def full(ada_mod):
        @jax.jit
        def fn(params, c, kv):
            cd = c.astype(dtype)
            fc = vit_c.apply({"params": params["vit_c"]}, cd)
            _, cs = ada_mod.apply({"params": params["adaFormer"]}, fc, None,
                                  style_kv=kv)
            return jnp.sum(jnp.clip(cs.astype(jnp.float32), 0, 255))
        return fn

    @jax.jit
    def vit_only(params, c):
        fc = vit_c.apply({"params": params["vit_c"]}, c.astype(dtype))
        return jnp.sum(fc[-1].astype(jnp.float32))

    @jax.jit
    def vit_plus_mhada(params, c, kv):
        cd = c.astype(dtype)
        fc = vit_c.apply({"params": params["vit_c"]}, cd)
        fcs, _ = ada.apply({"params": params["adaFormer"]}, fc, None,
                           style_kv=kv)
        return jnp.sum(fcs.astype(jnp.float32))

    it = args.iters
    t_vit = timeit(vit_only, params, content, iters=it)
    print(f"vit_c only:            {t_vit*1e3:7.2f} ms", flush=True)
    t_vm = timeit(vit_plus_mhada, params, content, kv, iters=it)
    print(f"vit_c + 6x MHAda:      {t_vm*1e3:7.2f} ms "
          f"(mhada ~{(t_vm-t_vit)*1e3:.2f})", flush=True)
    for name, mod in (("2x2", ada), ("col", ada_col),
                      ("unpacked", ada_unpacked),
                      ("col+fused", ada_best)):
        t = timeit(full(mod), params, content, kv, iters=it)
        print(f"full, decoder={name:9s} {t*1e3:7.2f} ms "
              f"(decoder ~{(t-t_vm)*1e3:.2f})  -> {1.0/t:6.1f} fps",
              flush=True)

    # batched transcode: 8 frames per dispatch, one shared style — outputs
    # identical to per-frame B=1 (every op is batch-independent), but the
    # MXU sees 8x the rows and fixed overheads amortise.
    B = args.batch
    frames = commit_to_device(
        jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32))
    kv8 = commit_to_device([
        (jnp.tile(k, (B, 1, 1)), jnp.tile(v, (B, 1, 1)))
        for k, v in kv
    ])
    ada_mega = AdaFormer(num_layers=cfg.num_layers, num_heads=cfg.num_heads,
                         activation=cfg.activation, use_pallas=True,
                         packed_decoder="mega", fuse_prologue=True)
    for name, mod in (("col", ada_col), ("col+fused", ada_best),
                      ("tail+fused", ada_tail), ("mega+fused", ada_mega)):
        try:
            t = timeit(full(mod), params, frames, kv8, iters=max(4, it // 4))
        except Exception as e:
            print(f"batched B={B} {name:10s} FAILED {str(e)[:90]}",
                  flush=True)
            continue
        print(f"batched B={B} {name:10s} {t*1e3:7.2f} ms/call -> "
              f"{t/B*1e3:5.2f} ms/frame, {B/t:6.1f} fps", flush=True)

    # batched in-graph stage ablations (per-frame at the headline protocol)
    it8 = max(4, it // 4)
    t_vit8 = timeit(vit_only, params, frames, iters=it8)
    print(f"batched B={B} vit_c only:       {t_vit8/B*1e3:5.2f} ms/frame",
          flush=True)

    @jax.jit
    def vit_plus_mhada8(params, c, kv):
        cd = c.astype(dtype)
        fc = vit_c.apply({"params": params["vit_c"]}, cd)
        fcs, _ = ada_best.apply({"params": params["adaFormer"]}, fc, None,
                                style_kv=kv)
        return jnp.sum(fcs.astype(jnp.float32))

    t_vm8 = timeit(vit_plus_mhada8, params, frames, kv8, iters=it8)
    print(f"batched B={B} vit + 6x MHAda:   {t_vm8/B*1e3:5.2f} ms/frame "
          f"(mhada ~{(t_vm8-t_vit8)/B*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
