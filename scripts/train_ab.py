"""A/B the training-build backend choices at the recipe shape (256^2 B=8
bf16): packed vs unpacked decoder, Pallas-VJP vs XLA-einsum attention, for
fwd+bwd cost.  Complements scripts/train_probe2.py (attribution) — this
picks the config.

Run: python scripts/train_ab.py [--iters 10]
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
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    from mhada_tpu.models import Decoder, VisionTransformer, AdaFormer
    from mhada_tpu.utils.device import commit_to_device

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    B = 8

    # --- decoder: packed col vs 2x2 vs unpacked, fwd+bwd ---
    fcs = commit_to_device(jnp.asarray(
        rng.standard_normal((B, 32, 32, 512)) * 0.5, dt))
    dec_col = Decoder(packed="col")
    params = jax.jit(dec_col.init)(
        jax.random.PRNGKey(1), fcs.astype(jnp.float32))["params"]
    params = commit_to_device(jax.tree.map(lambda x: x.astype(dt), params))

    for name, dec in (("col", dec_col), ("2x2", Decoder(packed="2x2")),
                      ("unpacked", Decoder(packed=False))):
        @jax.jit
        def g(p, x, d=dec):
            def f(pp):
                return jnp.sum(d.apply(
                    {"params": pp}, x).astype(jnp.float32))
            return jax.value_and_grad(f)(p)
        t = timeit(g, params, fcs, iters=args.iters)
        print(f"decoder[{name:8s}] fwd+bwd: {t * 1e3:7.2f} ms", flush=True)

    # --- attention backend inside the full vit+ada train builds ---
    content = commit_to_device(jnp.asarray(
        rng.uniform(0, 255, (B, 256, 256, 3)), jnp.float32))
    for name, use_pallas in (("pallas", True), ("xla-einsum", False)):
        vit = VisionTransformer(use_pallas=use_pallas)
        ada = AdaFormer(use_pallas=use_pallas, packed_decoder="col")
        pv = jax.jit(vit.init)(jax.random.PRNGKey(2),
                               jnp.zeros((1, 64, 64, 3)))["params"]
        feats0 = jax.eval_shape(
            lambda p, x: vit.apply({"params": p}, x), pv, content)
        pa = jax.jit(ada.init)(
            jax.random.PRNGKey(3),
            [jnp.zeros((1, 8, 8, 512))] * 3,
            [jnp.zeros((1, 8, 8, 512))] * 3)["params"]
        pv = commit_to_device(jax.tree.map(lambda x: x.astype(dt), pv))
        pa = commit_to_device(jax.tree.map(lambda x: x.astype(dt), pa))

        @jax.jit
        def g_vit(p, x, vit=vit):
            def f(pp):
                fs = vit.apply({"params": pp}, x.astype(dt))
                return sum(jnp.sum(t.astype(jnp.float32)) for t in fs)
            return jax.value_and_grad(f)(p)

        @jax.jit
        def g_both(p, pa_, x, vit=vit, ada=ada):
            def f(pp, ppa):
                fs = vit.apply({"params": pp}, x.astype(dt))
                _, cs = ada.apply({"params": ppa}, fs, fs)
                return jnp.sum(cs.astype(jnp.float32))
            return jax.value_and_grad(f, argnums=(0, 1))(p, pa_)

        t1 = timeit(g_vit, pv, content, iters=args.iters)
        t2 = timeit(g_both, pv, pa, content, iters=args.iters)
        print(f"attn[{name:10s}] vit fwd+bwd: {t1 * 1e3:7.2f} ms  "
              f"vit+ada+dec: {t2 * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
