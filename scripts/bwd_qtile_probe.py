"""A/B probe for the flash BACKWARD kernels at the image training shape
(B=8, h=8, N=M=1024, d=64, bf16 — 256^2 recipe tokens): query-tile width
AND gradient ship-dtype.

Two hypotheses, measured together, interleaved (the round-5 sequential-
sweep drift lesson, PERF.md):

1. g ship dtype.  The pre-r5 impls cast the output gradient to f32 before
   the kernel, so the dV = P^T@G and dA = G@V^T matmuls ran with f32
   operands — multiple MXU passes + 2x DMA.  In bf16 training those two
   are 40% (ViT) / 57% (MHAda) of the backward FLOPs.  `g_f32=True`
   restores the old behaviour for the A/B.

2. Query tile.  The combined dQ+dK+dV kernel runs tn=256 (ViT: grid
   64 x 4 = 256 steps/call) / tn=512 (MHAda: 128 steps); the video-shape
   datapoint (m=2048 tn=512: 2.06 ms < m=1024 tn=256: 2.36) says the call
   is grid-step-overhead-bound, so wider query tiles = fewer steps.

Run: python scripts/bwd_qtile_probe.py [--iters 20] [--rounds 5]
"""

import argparse
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
    from mhada_tpu.ops import attention_pallas as AP
    from mhada_tpu.ops import mhada_pallas as MP
    from mhada_tpu.utils.device import commit_to_device

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    B, H, N, D = 8, 8, 1024, 64
    dt = jnp.dtype(args.dtype).type

    def mk(*shape):
        return commit_to_device(
            jnp.asarray(rng.standard_normal(shape) * 0.5, dt))

    q, k, v, g = (mk(B, H, N, D) for _ in range(4))
    scale = 1.0 / np.sqrt(D)

    out, lse = jax.jit(lambda q, k, v: AP._attn_stream_fwd_impl(
        q, k, v, scale, 1024, 1024, with_res=True))(q, k, v)
    out, lse = commit_to_device(out), commit_to_device(lse)

    fcs_n = mk(B, H, N, D)
    out2, m1e2, lse2 = jax.jit(
        lambda q, k, v, f: MP._mhada_stream_fwd_impl(
            q, k, v, f, 1024, 1024, with_res=True))(q, k, v, fcs_n)
    m1e2, lse2 = commit_to_device(m1e2), commit_to_device(lse2)

    variants = {}
    for tn in (256, 512, 1024):
        for gf in (False, True):
            tag = f"[{tn},{'gf32' if gf else 'gbf16'}]"
            if gf and tn not in (256, 512):
                continue  # old baselines: vit 256 / ada 512 (+1 cross)
            variants[f"vit{tag}"] = (
                jax.jit(lambda q, k, v, out, lse, g, tn=tn, gf=gf:
                        AP._attn_stream_bwd_impl(
                            q, k, v, out, lse, g, scale, tn, 1024,
                            g_f32=gf)),
                (q, k, v, out, lse, g),
            )
            variants[f"ada{tag}"] = (
                jax.jit(lambda q, k, v, f, m1e2, lse2, g, tn=tn, gf=gf:
                        MP._mhada_stream_bwd_impl(
                            q, k, v, f, m1e2, lse2, g, tn, 1024,
                            g_f32=gf)),
                (q, k, v, fcs_n, m1e2, lse2, g),
            )

    # compile + parity first (drop VMEM-failures before timing)
    refs = {}
    live = {}
    for name, (fn, a) in variants.items():
        fam = name.split("[")[0]
        try:
            outp = fn(*a)
        except Exception as e:
            print(f"{name}: COMPILE/RUN FAILED {str(e)[:100]}", flush=True)
            continue
        flat = [np.asarray(x, np.float32) for x in jax.tree.leaves(outp)]
        if fam in refs:
            errs = [float(np.mean(np.abs(r - o)))
                    for r, o in zip(refs[fam], flat)]
            print(f"{name}: mean|err| vs first variant "
                  + " ".join(f"{e:.1e}" for e in errs), flush=True)
            assert max(errs) < 1e-2, (name, errs)
        else:
            refs[fam] = flat
        live[name] = (fn, a)

    results = {name: [] for name in live}
    for r in range(args.rounds):
        for name, (fn, a) in live.items():
            results[name].append(timeit(fn, *a, iters=args.iters))
        print(f"round {r}: " + "  ".join(
            f"{n}={results[n][-1] * 1e3:.2f}" for n in live), flush=True)

    print("\nmedians (ms):")
    for name, ts in results.items():
        ts = sorted(ts)
        print(f"  {name}: {ts[len(ts) // 2] * 1e3:7.2f}   "
              f"(min {ts[0] * 1e3:.2f}, max {ts[-1] * 1e3:.2f})")


if __name__ == "__main__":
    main()
