"""Fused Pallas TPU kernels for standard scaled-dot-product self-attention.

Used by the ViT encoder blocks in ``spatial`` mode: at 512^2 the token grid
is 4096 and XLA's unfused path materialises (H, 4096, 4096) f32 logits in
HBM per block (~512 MB), which dominates encoder latency.

Same two regimes as ops/mhada_pallas.py: single-pass (K/V VMEM-resident,
M <= 4096) and flash-style key streaming (online softmax) beyond.  The VJP
is flash-style Pallas too: the forward saves the output and row lse, the
backward streams tiles and rematerialises P = exp(scale*QK^T - lse) —
no (N, M) matrix ever hits HBM, forward or backward.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mhada_pallas import (
    _pad_axis, _block_sizes, _LANES, _LSE_PAD, SINGLE_PASS_MAX_M,
)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, m_actual: int):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if m_actual != k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < m_actual, logits, -jnp.inf)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / denom
    o_ref[0] = out.astype(o_ref.dtype)


def _attention_pallas_call(q, k, v, scale: float, block_n: int = 256):
    """Single-pass softmax(q k^T * scale) v; (B, H, N, D) x (B, H, M, D)."""
    b, h, n, d = q.shape
    m = k.shape[2]
    bh = b * h
    tn = min(block_n, max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // tn) * tn
    m_pad = -(-m // 128) * 128

    qf = _pad_axis(q.reshape(bh, n, d), 1, n_pad)
    kf = _pad_axis(k.reshape(bh, m, d), 1, m_pad)
    vf = _pad_axis(v.reshape(bh, m, d), 1, m_pad)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, m_actual=m),
        grid=(bh, n_pad // tn),
        in_specs=[
            pl.BlockSpec((1, tn, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * n_pad * m_pad * d * 2,
            bytes_accessed=4 * bh * (n_pad * d * 2 + m_pad * d * 2),
            transcendentals=bh * n_pad * m_pad,
        ),
    )(qf, kf, vf)
    return out[:, :n].reshape(b, h, n, d)


# -------------------------------------------- token-major forward kernel


def _tm_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, d: int,
               m_actual: int):
    """Two heads per program on 128-wide channel slices of the packed qkv.

    q_ref/k_ref/v_ref: (1, TN|M, 2d) slices of the SAME (B, N, 3C) qkv
    array (three BlockSpecs with different channel-block index maps) —
    no head-split transposes exist anywhere, in XLA or HBM.
    """
    f32 = jnp.float32
    q2 = q_ref[0]
    k2 = k_ref[0]
    v2 = v_ref[0]
    m_pad = k2.shape[0]
    for s in (0, d):
        logits = jax.lax.dot_general(
            q2[:, s:s + d], k2[:, s:s + d],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) * scale
        if m_actual != m_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < m_actual, logits, -jnp.inf)
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(v2.dtype), v2[:, s:s + d],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) / denom
        o_ref[0, :, s:s + d] = out.astype(o_ref.dtype)


def attention_pallas_tm(qkv, scale: float, num_heads: int,
                        block_n: int = 256):
    """Token-major fused self-attention: (B, N, 3C) packed qkv -> (B, N, C).

    Heads are CONTIGUOUS 64-channel slices of each of the q/k/v thirds
    (torch MultiheadAttention packing); programs take two heads (128
    lanes), so every BlockSpec is 128-aligned and the XLA-side
    split/transpose/merge of the head-major path disappears entirely.
    Single-pass (keys VMEM-resident) — inference path for M <= 4096;
    forward-only (the training path keeps the head-major flash VJP).
    """
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    assert d == 64 and c % 128 == 0, (d, c)
    pairs = c // 128
    if qkv.dtype.itemsize > 2:
        # f32 K/V tiles double: halve the query tile to stay under the
        # 16 MB VMEM scoped limit (logits are f32 either way)
        block_n = min(block_n, 128)
    tn = min(block_n, max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // tn) * tn
    qkv = _pad_axis(qkv, 1, n_pad)

    grid = (b, pairs, n_pad // tn)
    qspec = pl.BlockSpec((1, tn, 128), lambda i, p, j: (i, j, p),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, n_pad, 128),
                         lambda i, p, j: (i, 0, pairs + p),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, n_pad, 128),
                         lambda i, p, j: (i, 0, 2 * pairs + p),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_tm_kernel, scale=scale, d=d, m_actual=n),
        grid=grid,
        in_specs=[qspec, kspec, vspec],
        out_specs=pl.BlockSpec((1, tn, 128), lambda i, p, j: (i, j, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * c // 64 * n_pad * n_pad * 64 * 2,
            bytes_accessed=2 * b * n_pad * (c3 + c),
            transcendentals=b * (c // 64) * n_pad * n_pad,
        ),
    )(qkv, qkv, qkv)
    return out[:, :n]


# ----------------------------------- token-major TRAINING attention (VJP)


def _tm_res_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                   d: int, m_actual: int):
    """_tm_kernel + per-row lse residual (head a -> lanes [:d], b -> [d:])."""
    f32 = jnp.float32
    q2 = q_ref[0]
    k2 = k_ref[0]
    v2 = v_ref[0]
    m_pad = k2.shape[0]
    for s in (0, d):
        logits = jax.lax.dot_general(
            q2[:, s:s + d], k2[:, s:s + d],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) * scale
        if m_actual != m_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < m_actual, logits, -jnp.inf)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mx)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(v2.dtype), v2[:, s:s + d],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) / denom
        o_ref[0, :, s:s + d] = out.astype(o_ref.dtype)
        lse_ref[0, :, s:s + d] = jnp.broadcast_to(
            mx + jnp.log(denom), (out.shape[0], d))


def _attn_tm_fwd_impl(qkv, scale, num_heads, block_n, with_res):
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    pairs = c // 128
    if qkv.dtype.itemsize > 2:
        block_n = min(block_n, max(128, block_n // 2))
    tn = min(block_n, max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // tn) * tn
    qkv_p = _pad_axis(qkv, 1, n_pad)

    grid = (b, pairs, n_pad // tn)
    qspec = pl.BlockSpec((1, tn, 128), lambda i, p, j: (i, j, p),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, n_pad, 128), lambda i, p, j: (i, 0, pairs + p),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, n_pad, 128),
                         lambda i, p, j: (i, 0, 2 * pairs + p),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, tn, 128), lambda i, p, j: (i, j, p),
                         memory_space=pltpu.VMEM)
    if not with_res:
        out = pl.pallas_call(
            functools.partial(_tm_kernel, scale=scale, d=d, m_actual=n),
            grid=grid, in_specs=[qspec, kspec, vspec], out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((b, n_pad, c), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
        )(qkv_p, qkv_p, qkv_p)
        return out[:, :n], None
    out, lse = pl.pallas_call(
        functools.partial(_tm_res_kernel, scale=scale, d=d, m_actual=n),
        grid=grid,
        in_specs=[qspec, kspec, vspec],
        out_specs=[ospec, ospec],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (c // 64) * n_pad * n_pad * 64 * 2,
            bytes_accessed=2 * b * n_pad * (c3 + c) + 4 * b * n_pad * c,
            transcendentals=b * (c // 64) * n_pad * n_pad,
        ),
    )(qkv_p, qkv_p, qkv_p)
    return out[:, :n], lse[:, :n]


def _tm_bwd_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                   dq_ref, dk_ref, dv_ref, acc_dk, acc_dv,
                   *, scale: float, d: int, m_actual: int, n_nb: int):
    """Combined dQ+dK+dV, token-major: channel-sliced head pairs of the
    SAME (B, N, 3C) qkv, gradients written back as (B, N, C) channel
    blocks — zero head-split transposes in XLA, forward or backward.
    Keys VMEM-resident (the training regime, m_pad <= 2048); dK/dV
    accumulate across the sequential query-block grid axis."""
    jn = pl.program_id(2)

    @pl.when(jn == 0)
    def _init():
        acc_dk[...] = jnp.zeros(acc_dk.shape, acc_dk.dtype)
        acc_dv[...] = jnp.zeros(acc_dv.shape, acc_dv.dtype)

    q2 = q_ref[0]
    k2 = k_ref[0]
    v2 = v_ref[0]
    g2 = g_ref[0]
    m_pad = k2.shape[0]
    for s in (0, d):
        logits = jax.lax.dot_general(
            q2[:, s:s + d], k2[:, s:s + d],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        p = jnp.exp(logits - lse_ref[0][:, s:s + 1])
        if m_actual != m_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
            p = jnp.where(col < m_actual, p, 0.0)
        g_h = g2[:, s:s + d]
        acc_dv[:, s:s + d] += jax.lax.dot_general(
            p.astype(g_h.dtype), g_h,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        da = jax.lax.dot_general(
            g_h, v2[:, s:s + d],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dl = p * (da - delta_ref[0][:, s:s + 1]) * scale
        dq_ref[0, :, s:s + d] = jax.lax.dot_general(
            dl.astype(k2.dtype), k2[:, s:s + d],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        acc_dk[:, s:s + d] += jax.lax.dot_general(
            dl.astype(q2.dtype), q2[:, s:s + d],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jn == n_nb - 1)
    def _finalize():
        dk_ref[0] = acc_dk[...].astype(dk_ref.dtype)
        dv_ref[0] = acc_dv[...].astype(dv_ref.dtype)


def _attn_tm_bwd_impl(qkv, out, lse, g, scale, num_heads, block_n):
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    pairs = c // 128
    f32 = jnp.float32

    # delta (softmax-Jacobian row term), per head, broadcast back over the
    # head's 64 channels so the kernel reads it as a lane-block column
    delta = jnp.sum(
        (g.astype(f32) * out.astype(f32)).reshape(b, n, 2 * pairs, 64),
        axis=-1)
    delta = jnp.repeat(delta, 64, axis=-1)  # (b, n, c) f32
    gq = g.astype(qkv.dtype)  # flash-bwd convention: dO in compute dtype

    small = 2 if qkv.dtype.itemsize > 2 else 1
    m_pad128 = -(-n // 128) * 128
    tn = min((512 if m_pad128 <= 1024 else 256) // small,
             max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // tn) * tn
    qkv_p = _pad_axis(qkv, 1, n_pad)
    gp = _pad_axis(gq, 1, n_pad)
    lse_p = _pad_axis(lse, 1, n_pad)
    delta_p = _pad_axis(delta, 1, n_pad)
    n_nb = n_pad // tn

    rowspec = pl.BlockSpec((1, tn, 128), lambda i, p, j: (i, j, p),
                           memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, n_pad, 128), lambda i, p, j: (i, 0, pairs + p),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, n_pad, 128),
                         lambda i, p, j: (i, 0, 2 * pairs + p),
                         memory_space=pltpu.VMEM)
    kvout = pl.BlockSpec((1, n_pad, 128), lambda i, p, j: (i, 0, p),
                         memory_space=pltpu.VMEM)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_tm_bwd_kernel, scale=scale, d=d, m_actual=n,
                          n_nb=n_nb),
        grid=(b, pairs, n_nb),
        in_specs=[rowspec, kspec, vspec, rowspec, rowspec, rowspec],
        out_specs=[rowspec, kvout, kvout],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n_pad, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n_pad, c), qkv.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pad, 128), f32),
            pltpu.VMEM((n_pad, 128), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (c // 64) * n_pad * n_pad * 64 * 5,
            bytes_accessed=2 * b * n_pad * (c3 + 2 * c) * 2
            + 8 * b * n_pad * c,
            transcendentals=b * (c // 64) * n_pad * n_pad,
        ),
    )(qkv_p, qkv_p, qkv_p, gp, lse_p, delta_p)
    return jnp.concatenate([dq[:, :n], dk[:, :n], dv[:, :n]], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def attention_tm_train(qkv, scale, num_heads, block_n=256):
    """Differentiable token-major self-attention: (B, N, 3C) packed qkv ->
    (B, N, C), with a token-major combined backward — the training twin of
    ``attention_pallas_tm``.  Removes every XLA head-split transpose from
    the train step (measured ~0.3-0.6 ms per attention site fwd+bwd at the
    recipe shape — scripts/glue_probe.py).  Single-pass (keys
    VMEM-resident): caller routes only N <= 2048 here."""
    return _attn_tm_fwd_impl(qkv, scale, num_heads, block_n,
                             with_res=False)[0]


def _attn_tm_fwd(qkv, scale, num_heads, block_n):
    # widened training forward tile (same rationale as _attn_fwd), capped
    # so the per-head (TN, M) f32 logit tile stays <= 4 MB: at the video
    # token count (N=M=2048) tn=1024 allocates 17.5 MB scoped VMEM > the
    # 16 MB limit (measured OOM); tn = 2^20/m_pad keeps it constant
    n = qkv.shape[1]
    m_pad = -(-n // 128) * 128
    tn = max(block_n, min(1024, max(256, (1 << 20) // m_pad)))
    out, lse = _attn_tm_fwd_impl(qkv, scale, num_heads, tn, with_res=True)
    return out, (qkv, out, lse)


def _attn_tm_bwd(scale, num_heads, block_n, res, g):
    qkv, out, lse = res
    return (_attn_tm_bwd_impl(qkv, out, lse, g, scale, num_heads, block_n),)


attention_tm_train.defvjp(_attn_tm_fwd, _attn_tm_bwd)


# ------------------------------------------------- streaming forward kernel


def _stream_kernel(q_ref, k_ref, v_ref, *refs, scale: float, m_actual: int,
                   tm: int, n_mb: int, with_res: bool):
    if with_res:
        o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
    else:
        o_ref, m_scr, l_scr, acc_scr = refs
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, m_scr.dtype)
        l_scr[...] = jnp.zeros(l_scr.shape, l_scr.dtype)
        acc_scr[...] = jnp.zeros(acc_scr.shape, acc_scr.dtype)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if m_actual % tm != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * tm
        logits = jnp.where(col < m_actual, logits, -jnp.inf)

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[...] = acc_scr[...] * alpha + pv
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == n_mb - 1)
    def _finalize():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[...] / l).astype(o_ref.dtype)
        if with_res:
            lse_ref[0] = jnp.broadcast_to(
                m_scr[:, :1] + jnp.log(l), lse_ref.shape[1:])


def _attn_stream_fwd_impl(q, k, v, scale, block_n, block_m, with_res):
    b, h, n, d = q.shape
    m = k.shape[2]
    bh = b * h
    tn, tm, n_pad, m_pad = _block_sizes(n, m, block_n, block_m)

    qf = _pad_axis(q.reshape(bh, n, d), 1, n_pad)
    kf = _pad_axis(k.reshape(bh, m, d), 1, m_pad)
    vf = _pad_axis(v.reshape(bh, m, d), 1, m_pad)

    n_mb = m_pad // tm
    grid = (bh, n_pad // tn, n_mb)
    qspec = pl.BlockSpec((1, tn, d), lambda i, jn, jm: (i, jn, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, tm, d), lambda i, jn, jm: (i, jm, 0),
                          memory_space=pltpu.VMEM)
    out_specs = [qspec]
    out_shapes = [jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype)]
    if with_res:
        out_specs.append(
            pl.BlockSpec((1, tn, _LANES), lambda i, jn, jm: (i, jn, 0),
                         memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((bh, n_pad, _LANES), jnp.float32))

    res = pl.pallas_call(
        functools.partial(_stream_kernel, scale=scale, m_actual=m, tm=tm,
                          n_mb=n_mb, with_res=with_res),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((tn, _LANES), jnp.float32),
            pltpu.VMEM((tn, _LANES), jnp.float32),
            pltpu.VMEM((tn, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * n_pad * m_pad * d * 2,
            bytes_accessed=4 * bh * (n_pad * d * 2 + m_pad * d * 2),
            transcendentals=bh * n_pad * m_pad,
        ),
    )(qf, kf, vf)

    if not with_res:
        return res[0][:, :n].reshape(b, h, n, d)
    out = res[0][:, :n].reshape(b, h, n, d)
    lse = res[1][:, :n, 0].reshape(b, h, n)
    return out, lse


# ------------------------------------- wide (transposed) streaming forward


def _stream_wide_kernel(qt_ref, k_ref, vt_ref, o_ref,
                        ma_scr, la_scr, mb_scr, lb_scr, acc_scr,
                        *, scale: float, m_actual: int, tm: int, n_mb: int,
                        d: int):
    """Two heads per program, everything transposed (output-major = lanes).

    The head-major streaming kernel's A@V is a (TN, TM) @ (TM, 64) matmul:
    64 output lanes = half the MXU's 128 columns idle, so P@V costs the
    same as a 128-wide product (PERF.md roofline: ~51 TF/s ceiling at
    1024^2).  Computed transposed — L^T = K @ Q^T (TN lanes wide) and
    O^T = V^T @ P^T ((64, TN): 64 *streamed sublane rows*, full 128-lane
    output tiles, full-depth TM contraction) — the P@V pass costs half.
    QK's d=64 contraction (half MXU depth) is irreducible either way.

    Online softmax runs per lane-column: the running max / normaliser are
    (1, TN) lane vectors broadcast over sublanes, and the tile max/sum are
    cross-sublane reductions (native on the VPU).
    """
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        ma_scr[...] = jnp.full(ma_scr.shape, -jnp.inf, ma_scr.dtype)
        mb_scr[...] = jnp.full(mb_scr.shape, -jnp.inf, mb_scr.dtype)
        la_scr[...] = jnp.zeros(la_scr.shape, la_scr.dtype)
        lb_scr[...] = jnp.zeros(lb_scr.shape, lb_scr.dtype)
        acc_scr[...] = jnp.zeros(acc_scr.shape, acc_scr.dtype)

    k2 = k_ref[0]      # (TM, 128) — two heads' keys, token-major
    qt2 = qt_ref[0]    # (128, TN) — two heads' queries, channel-major
    vt2 = vt_ref[0]    # (128, TM) — two heads' values, channel-major

    for s, m_scr, l_scr in ((0, ma_scr, la_scr), (d, mb_scr, lb_scr)):
        lt = jax.lax.dot_general(
            k2[:, s:s + d], qt2[s:s + d, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if m_actual % tm != 0:
            row = jax.lax.broadcasted_iota(jnp.int32, lt.shape, 0) + j * tm
            lt = jnp.where(row < m_actual, lt, -jnp.inf)
        m_prev = m_scr[:1, :]
        m_new = jnp.maximum(m_prev, jnp.max(lt, axis=0, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        pt = jnp.exp(lt - m_new)
        l_new = l_scr[:1, :] * alpha + jnp.sum(pt, axis=0, keepdims=True)
        pv = jax.lax.dot_general(
            vt2[s:s + d, :], pt.astype(vt2.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[s:s + d, :] = acc_scr[s:s + d, :] * alpha + pv
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == n_mb - 1)
    def _finalize():
        o_ref[0, :d, :] = (acc_scr[:d, :] / la_scr[:1, :]).astype(o_ref.dtype)
        o_ref[0, d:, :] = (acc_scr[d:, :] / lb_scr[:1, :]).astype(o_ref.dtype)


def attention_stream_wide(qkv, scale: float, num_heads: int,
                          block_n: int | None = None,
                          block_m: int | None = None):
    """Token-major TRANSPOSED streaming self-attention for long sequences:
    (B, N, 3C) packed qkv -> (B, N, C).

    The long-sequence (L > 4096) counterpart of ``attention_pallas_tm``:
    heads are contiguous 64-channel slices of the packed qkv (torch MHA
    packing), two heads per 128-lane program, keys streamed with an online
    softmax.  Q and V are shipped channel-major ((B, C, N) XLA transposes —
    one bandwidth pass each) so the P@V product runs transposed at full
    MXU width; see _stream_wide_kernel.  Forward-only (inference builds —
    the training path keeps the head-major flash VJP).
    """
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    assert d == 64 and c % 128 == 0, (d, c)
    pairs = c // 128
    small = 2 if qkv.dtype.itemsize > 2 else 1
    if block_n is None:
        block_n = 512 // small
    if block_m is None:
        # scripts/wide_probe.py sweep at N=M=16384 bf16: (512, 4096)
        # 10.26 ms vs (512, 2048) 10.72 / (256, 4096) 13.53
        block_m = 4096 // small
    tn, tm, n_pad, m_pad = _block_sizes(n, n, block_n, block_m)
    # qkv is padded once to max(n_pad, m_pad); every Pallas block shape must
    # divide that padded token axis, which holds iff tn divides tm.
    assert tm % tn == 0, (tn, tm)
    qkv_p = _pad_axis(qkv, 1, max(n_pad, m_pad))
    qt = qkv_p[:, :, :c].transpose(0, 2, 1)
    vt = qkv_p[:, :, 2 * c:].transpose(0, 2, 1)

    n_mb = m_pad // tm
    grid = (b, pairs, n_pad // tn, n_mb)
    qtspec = pl.BlockSpec((1, 128, tn), lambda i, p, jn, jm: (i, p, jn),
                          memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, tm, 128),
                         lambda i, p, jn, jm: (i, jm, pairs + p),
                         memory_space=pltpu.VMEM)
    vtspec = pl.BlockSpec((1, 128, tm), lambda i, p, jn, jm: (i, p, jm),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_stream_wide_kernel, scale=scale, m_actual=n,
                          tm=tm, n_mb=n_mb, d=d),
        grid=grid,
        in_specs=[qtspec, kspec, vtspec],
        out_specs=pl.BlockSpec((1, 128, tn), lambda i, p, jn, jm: (i, p, jn),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, n_pad), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, tn), jnp.float32),
            pltpu.VMEM((8, tn), jnp.float32),
            pltpu.VMEM((8, tn), jnp.float32),
            pltpu.VMEM((8, tn), jnp.float32),
            pltpu.VMEM((2 * d, tn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (c // 64) * n_pad * m_pad * 64 * 2,
            # Q read + O write (one pass each) PLUS the K/V streams, which
            # the kernel re-fetches in full once per query block (the
            # dominant term at long N: ~n_pad/tn full K+V passes).
            bytes_accessed=qkv.dtype.itemsize * b * (
                2 * c * n_pad + (n_pad // tn) * m_pad * 2 * c),
            transcendentals=b * (c // 64) * n_pad * m_pad,
        ),
    )(qt, qkv_p, vt)
    return out[:, :, :n].transpose(0, 2, 1)


# ------------------------------------------------ streaming backward kernels


def _bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                   dq_ref, acc_scr, *, scale: float, m_actual: int,
                   tm: int, n_mb: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_scr[...] = jnp.zeros(acc_scr.shape, acc_scr.dtype)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jnp.exp(logits - lse_ref[0][:, :1])
    if m_actual % tm != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) + j * tm
        p = jnp.where(col < m_actual, p, 0.0)

    da = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dl = p * (da - delta_ref[0][:, :1]) * scale
    acc_scr[...] += jax.lax.dot_general(
        dl.astype(k.dtype), k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_mb - 1)
    def _finalize():
        dq_ref[0] = acc_scr[...].astype(dq_ref.dtype)


def _bwd_combined_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                         dq_ref, dk_ref, dv_ref, acc_dk, acc_dv,
                         *, scale: float, m_actual: int, tm: int,
                         n_nb: int):
    """dQ + dK + dV in one pass when the whole key set fits one block
    (m_pad == tm) — logits/P/dA computed once instead of once per kernel
    (~30% fewer backward FLOPs, half the exp traffic); see the MHAda
    twin (mhada_pallas._bwd_combined_kernel)."""
    jn = pl.program_id(1)

    @pl.when(jn == 0)
    def _init():
        acc_dk[...] = jnp.zeros(acc_dk.shape, acc_dk.dtype)
        acc_dv[...] = jnp.zeros(acc_dv.shape, acc_dv.dtype)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jnp.exp(logits - lse_ref[0][:, :1])
    if m_actual % tm != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        p = jnp.where(col < m_actual, p, 0.0)

    acc_dv[...] += jax.lax.dot_general(
        p.astype(g.dtype), g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    da = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dl = p * (da - delta_ref[0][:, :1]) * scale
    dq_ref[0] = jax.lax.dot_general(
        dl.astype(k.dtype), k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    acc_dk[...] += jax.lax.dot_general(
        dl.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(jn == n_nb - 1)
    def _finalize():
        dk_ref[0] = acc_dk[...].astype(dk_ref.dtype)
        dv_ref[0] = acc_dv[...].astype(dv_ref.dtype)


def _bwd_dkv_kernel(k_ref, v_ref, q_ref, g_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, acc_dk, acc_dv,
                    *, scale: float, m_actual: int, tm: int, n_nb: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_dk[...] = jnp.zeros(acc_dk.shape, acc_dk.dtype)
        acc_dv[...] = jnp.zeros(acc_dv.shape, acc_dv.dtype)

    jm = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jnp.exp(logits - lse_ref[0][:, :1])
    if m_actual % tm != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) + jm * tm
        p = jnp.where(col < m_actual, p, 0.0)

    acc_dv[...] += jax.lax.dot_general(
        p.astype(g.dtype), g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    da = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dl = p * (da - delta_ref[0][:, :1]) * scale
    acc_dk[...] += jax.lax.dot_general(
        dl.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_nb - 1)
    def _finalize():
        dk_ref[0] = acc_dk[...].astype(dk_ref.dtype)
        dv_ref[0] = acc_dv[...].astype(dv_ref.dtype)


def _attn_stream_bwd_impl(q, k, v, out, lse, g, scale, block_n, block_m,
                          g_f32: bool = False):
    # g_f32=True restores the pre-r5 f32-shipped gradient (A/B hook for
    # scripts/bwd_qtile_probe.py only — measured 4x slower dV/dA matmuls).
    b, h, n, d = q.shape
    m = k.shape[2]
    bh = b * h
    tn, tm, n_pad, m_pad = _block_sizes(n, m, block_n, block_m)

    f32 = jnp.float32
    gf = g.astype(f32)
    delta = jnp.sum(gf * out.astype(f32), axis=-1)  # (b, h, n)

    qf = _pad_axis(q.reshape(bh, n, d), 1, n_pad)
    kf = _pad_axis(k.reshape(bh, m, d), 1, m_pad)
    vf = _pad_axis(v.reshape(bh, m, d), 1, m_pad)
    # Ship the output gradient in the INPUT dtype (flash-bwd convention:
    # dO in compute precision, f32 accumulation).  The old f32 gp made the
    # kernels' dV = P^T@G and dA = G@V^T matmuls run with f32 operands —
    # multiple MXU passes + 2x DMA; in bf16 training those two are 40% of
    # the backward FLOPs.  delta above keeps its f32 reduction.
    gp = _pad_axis(
        g.astype(jnp.float32 if g_f32 else q.dtype).reshape(bh, n, d),
        1, n_pad)
    lse_f = jnp.full((bh, n_pad, _LANES), _LSE_PAD, f32)
    lse_f = lse_f.at[:, :n, :].set(lse.reshape(bh, n, 1))
    delta_f = _pad_axis(
        jnp.broadcast_to(delta.reshape(bh, n, 1), (bh, n, _LANES)), 1, n_pad
    )

    qspec = pl.BlockSpec((1, tn, d), lambda i, jn, jm: (i, jn, 0),
                         memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, tn, _LANES), lambda i, jn, jm: (i, jn, 0),
                           memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, tm, d), lambda i, jn, jm: (i, jm, 0),
                          memory_space=pltpu.VMEM)
    n_nb = n_pad // tn
    n_mb = m_pad // tm

    if n_mb == 1:
        # whole key set in one block (training shapes): one combined pass
        qspec1 = pl.BlockSpec((1, tn, d), lambda i, jn: (i, jn, 0),
                              memory_space=pltpu.VMEM)
        rowspec1 = pl.BlockSpec((1, tn, _LANES), lambda i, jn: (i, jn, 0),
                                memory_space=pltpu.VMEM)
        kvspec1 = pl.BlockSpec((1, tm, d), lambda i, jn: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_combined_kernel, scale=scale,
                              m_actual=m, tm=tm, n_nb=n_nb),
            grid=(bh, n_nb),
            in_specs=[qspec1, kvspec1, kvspec1, qspec1, rowspec1,
                      rowspec1],
            out_specs=[qspec1, kvspec1, kvspec1],
            out_shape=[
                jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
                jax.ShapeDtypeStruct((bh, m_pad, d), k.dtype),
                jax.ShapeDtypeStruct((bh, m_pad, d), v.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((tm, d), f32),
                pltpu.VMEM((tm, d), f32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(qf, kf, vf, gp, lse_f, delta_f)
        return (
            dq[:, :n].reshape(b, h, n, d),
            dk[:, :m].reshape(b, h, m, d),
            dv[:, :m].reshape(b, h, m, d),
        )

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, m_actual=m, tm=tm,
                          n_mb=n_mb),
        grid=(bh, n_nb, n_mb),
        in_specs=[qspec, kvspec, kvspec, qspec, rowspec, rowspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((tn, d), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf, vf, gp, lse_f, delta_f)

    kvspec2 = pl.BlockSpec((1, tm, d), lambda i, jm, jn: (i, jm, 0),
                           memory_space=pltpu.VMEM)
    qspec2 = pl.BlockSpec((1, tn, d), lambda i, jm, jn: (i, jn, 0),
                          memory_space=pltpu.VMEM)
    rowspec2 = pl.BlockSpec((1, tn, _LANES), lambda i, jm, jn: (i, jn, 0),
                            memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, m_actual=m, tm=tm,
                          n_nb=n_nb),
        grid=(bh, n_mb, n_nb),
        in_specs=[kvspec2, kvspec2, qspec2, qspec2, rowspec2, rowspec2],
        out_specs=[kvspec2, kvspec2],
        out_shape=[
            jax.ShapeDtypeStruct((bh, m_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, m_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tm, d), f32),
            pltpu.VMEM((tm, d), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(kf, vf, qf, gp, lse_f, delta_f)

    return (
        dq[:, :n].reshape(b, h, n, d),
        dk[:, :m].reshape(b, h, m, d),
        dv[:, :m].reshape(b, h, m, d),
    )


# ------------------------------------------------------------------ wiring


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _attn_custom(q, k, v, scale, block_n, block_m, streaming):
    if streaming:
        return _attn_stream_fwd_impl(q, k, v, scale, block_n, block_m,
                                     with_res=False)
    return _attention_pallas_call(q, k, v, scale, block_n)


def _attn_fwd(q, k, v, scale, block_n, block_m, streaming):
    # Training forward: widen the query tile to 1024 rows (512 f32) — the
    # r5 fwd-tile A/B at the training shape (N=M=1024 B=8 bf16,
    # /tmp-pattern interleaved) reads vit[1024] 1.18-1.29 vs vit[256]
    # 1.24-1.58 ms at the dispatch floor; never slower, fewer grid steps.
    tn = max(block_n, 1024 // (2 if q.dtype.itemsize > 2 else 1))
    out, lse = _attn_stream_fwd_impl(q, k, v, scale, tn, block_m,
                                     with_res=True)
    return out, (q, k, v, out, lse)


def _attn_bwd(scale, block_n, block_m, streaming, res, g):
    q, k, v, out, lse = res
    # trace-time A/B hook (scripts/train_qtile_ab.py): ship g in f32 as the
    # pre-r5 impls did
    g_f32 = bool(int(os.environ.get("MHADA_BWD_G_F32", "0")))
    # Measured tile policy (scripts/bwd_tile_probe.py + the m=2048 A/B):
    #   m <= 1024:        (256, 1024) — combined one-pass kernel, 2.36 ms
    #                     vs 3.46 for the old (256, 512) two-pass
    #   1024 < m <= 2048: (512, 2048) — combined, 2.06 vs 2.86 ms
    #                     (f32 halves the query tile: 8 MB of f32 score
    #                     tiles otherwise)
    #   larger:           (256, 1024) two-pass streaming
    m = k.shape[2]
    if 1024 < m <= 2048:
        tn = 256 if q.dtype.itemsize > 2 else 512
        return _attn_stream_bwd_impl(q, k, v, out, lse, g, scale, tn, 2048,
                                     g_f32=g_f32)
    return _attn_stream_bwd_impl(q, k, v, out, lse, g, scale,
                                 min(block_n, 256), min(block_m, 1024),
                                 g_f32=g_f32)


_attn_custom.defvjp(_attn_fwd, _attn_bwd)


def attention_pallas(q, k, v, scale: float, block_n: int | None = None,
                     block_m: int | None = None,
                     streaming: bool | None = None):
    """Fused attention with a flash-style Pallas VJP (forward saves out+lse,
    backward streams tiles) so the encoder trains without ever materialising
    the (N, M) attention matrix.

    Default tiles: single-pass (256, m); streaming (512, 2048), halved for
    f32 — see mhada_attention_pallas for the v5e measurements."""
    if streaming is None:
        streaming = k.shape[2] > SINGLE_PASS_MAX_M
    small = 2 if q.dtype.itemsize > 2 else 1
    if block_n is None:
        block_n = (512 if streaming else 256) // small
    if block_m is None:
        block_m = 2048 // small
    return _attn_custom(q, k, v, scale, block_n, block_m, bool(streaming))
