"""A/B a software-pipelined variant of the fused-prologue MHAda kernel.

Current kernel (ops/mhada_pallas.py::_fused_kernel) runs its two heads
strictly sequentially, so the (TN, M) exp/softmax VPU passes sit on the
critical path between the two MXU matmuls (QK^T and P@[V|V^2]); measured
~0.43 ms/block/frame vs the 0.35 ms matmul floor (PERF.md).  The variant
computes BOTH heads' logits first, then both exps, then both P@[V|V^2] —
giving Mosaic's scheduler freedom to overlap head B's VPU work with head
A's MXU work.  VMEM holds two (TN, M) f32 score tiles, so TN drops to 128
at M=4096 (2 x 2 MB).

Run: python scripts/mhada_pipe_probe.py [--iters 30]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=30, warm=3):
    for _ in range(warm):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def _pipe_kernel(fc_ref, fcs_ref, st_ref, wf_ref, fb_ref, k_ref, v_ref,
                 o_ref, *, d: int, m_actual: int):
    f32 = jnp.float32
    st = st_ref[0]
    fc2 = fc_ref[0]
    fs2 = fcs_ref[0]
    wf = wf_ref[0]
    fb = fb_ref[0]
    k2 = k_ref[0]
    v2 = v_ref[0]
    m_pad = k2.shape[0]

    ps = []
    for s in (0, d):
        qn = (fc2[:, s:s + d].astype(f32) - st[0:1, s:s + d]) \
            * st[1:2, s:s + d]
        q = jax.lax.dot_general(
            qn.astype(k2.dtype), wf[:, s:s + d],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + fb[:, s:s + d]
        logits = jax.lax.dot_general(
            q.astype(k2.dtype), k2[:, s:s + d],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        if m_actual != m_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < m_actual, logits, -jnp.inf)
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits)
        ps.append((p, jnp.sum(p, axis=-1, keepdims=True)))

    for i, s in enumerate((0, d)):
        p, denom = ps[i]
        v_h = v2[:, s:s + d]
        vv = jnp.concatenate([v_h, jnp.square(v_h)], axis=-1)
        both = jax.lax.dot_general(
            p.astype(v2.dtype), vv,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) / denom
        m1 = both[:, :d]
        e2 = both[:, d:]
        sd = jnp.sqrt(jnp.clip(e2 - jnp.square(m1), min=1e-6))
        fcs_n = (fs2[:, s:s + d].astype(f32) - st[2:3, s:s + d]) \
            * st[3:4, s:s + d]
        o_ref[0, :, s:s + d] = (sd * fcs_n + m1).astype(o_ref.dtype)


def call_variant(kernel, fc_tok, fcs_tok, stats, wf, fb, k, v, tn):
    from mhada_tpu.ops.mhada_pallas import _pad_axis

    b, n, c = fc_tok.shape
    hh, d, _ = wf.shape
    m = k.shape[1]
    pairs = c // 128
    n_pad = -(-n // tn) * tn
    m_pad = -(-m // 128) * 128
    fcp = _pad_axis(fc_tok, 1, n_pad)
    fsp = _pad_axis(fcs_tok, 1, n_pad)
    kp = _pad_axis(k, 1, m_pad)
    vp = _pad_axis(v, 1, m_pad)
    wfp = wf.reshape(pairs, 2, d, d).transpose(0, 2, 1, 3) \
        .reshape(pairs, d, 2 * d)
    fbp = fb.reshape(pairs, 1, 2 * d)
    grid = (b, pairs, n_pad // tn)
    qspec = pl.BlockSpec((1, tn, 128), lambda i, p, j: (i, j, p),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, m_pad, 128), lambda i, p, j: (i, 0, p),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kernel, d=d, m_actual=m),
        grid=grid,
        in_specs=[
            qspec, qspec,
            pl.BlockSpec((1, 4, 128), lambda i, p, j: (i, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, 128), lambda i, p, j: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i, p, j: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            kvspec, kvspec,
        ],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), fc_tok.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * c // 64 * n_pad * m_pad * 64 * 3,
            bytes_accessed=2 * b * (3 * n_pad * c + 2 * m_pad * c),
            transcendentals=b * (c // 64) * n_pad * m_pad,
        ),
    )(fcp, fsp, stats.astype(jnp.float32), wfp, fbp, kp, vp)[:, :n]


def main():
    from mhada_tpu.ops.mhada_pallas import _fused_kernel, mhada_fused_prologue
    from mhada_tpu.utils.device import commit_to_device

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    B, N, M, C, H, D = 8, 4096, 4096, 512, 8, 64
    dt = jnp.bfloat16

    def mk(*shape, scale=0.5):
        return commit_to_device(
            jnp.asarray(rng.standard_normal(shape) * scale, dt))

    fc, fcs = mk(B, N, C), mk(B, N, C)
    k, v = mk(B, M, C), mk(B, M, C)
    wf = mk(H, D, D, scale=0.35)
    fb = mk(H, D, scale=0.1)
    stats = commit_to_device(jnp.asarray(
        np.stack([rng.standard_normal((B, C)) * 0.1,
                  1.0 + rng.standard_normal((B, C)) * 0.1,
                  rng.standard_normal((B, C)) * 0.1,
                  1.0 + rng.standard_normal((B, C)) * 0.1], axis=1),
        jnp.float32))

    base = jax.jit(lambda *a: mhada_fused_prologue(*a))
    t0 = timeit(base, fc, fcs, stats, wf, fb, k, v, iters=args.iters)
    ref = np.asarray(base(fc, fcs, stats, wf, fb, k, v), np.float32)
    print(f"current (tn=256 seq) : {t0 * 1e3:7.3f} ms/dispatch "
          f"({t0 * 1e3 / B:6.4f} ms/frame)", flush=True)

    for name, kern, tn in (("seq tn=128", _fused_kernel, 128),
                           ("pipe tn=128", _pipe_kernel, 128),
                           ("pipe tn=256", _pipe_kernel, 256)):
        fn = jax.jit(lambda *a, k=kern, t=tn: call_variant(k, *a, t))
        try:
            t = timeit(fn, fc, fcs, stats, wf, fb, k, v, iters=args.iters)
            got = np.asarray(fn(fc, fcs, stats, wf, fb, k, v), np.float32)
        except Exception as e:
            print(f"{name:20s}: FAILED {str(e)[:100]}")
            continue
        err = np.abs(got - ref).max()
        print(f"{name:20s} : {t * 1e3:7.3f} ms/dispatch "
              f"({t * 1e3 / B:6.4f} ms/frame)  maxerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
