"""Fused Pallas TPU kernels for MHAda adaptive attention.

Computes, per (batch*head) slice, without materialising the (N, M) attention
matrix in HBM:

    A   = softmax(Q K^T)            (unscaled, reference adaDecoder.py:11-17)
    M1  = A V
    E2  = A V^2
    out = sqrt(clamp(E2 - M1^2, 1e-6)) * fcs_n + M1

Two forward regimes (SURVEY.md §5 long-context row, §7 step 3):

- **single-pass** (``M <= 4096``, i.e. up to 512² inputs): K/V resident in
  VMEM per head, one (TN, M) score tile, no online softmax — fastest.
- **streaming** (larger M, e.g. 1024² -> M=16384): flash-style key-block
  streaming with online softmax and running A·V / A·V² accumulators; VMEM
  holds only (TN, TM) tiles, so N and M are unbounded.

The backward is likewise flash-style Pallas (no (N, M) materialisation in
XLA either): the forward saves M1/E2 and the row log-sum-exp, and two
kernels stream the key (dQ) and query (dK, dV) axes, rematerialising
P = exp(QK^T - lse) per tile.  Key identity making this cheap: the softmax
Jacobian row term  sum_m A_nm dA_nm  equals  d_M1·M1 + d_E2·E2  row-wise,
so it needs no extra pass.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# Above this key length the single-pass kernel's VMEM working set
# ((M, D) K/V + (TN, M) logits) stops fitting; stream instead.
SINGLE_PASS_MAX_M = 4096
_LSE_PAD = 1e30  # padded query rows: exp(x - 1e30) == 0 in f32


def _kernel(q_ref, k_ref, v_ref, f_ref, o_ref, *, m_actual: int):
    q = q_ref[0]  # (TN, D)
    k = k_ref[0]  # (M, D)
    # keep V in the input dtype: the two A.V matmuls are 2/3 of the kernel's
    # FLOPs and f32 operands run the MXU at quarter rate. Accumulation is
    # f32 via preferred_element_type either way.
    v = v_ref[0]  # (M, D)

    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TN, M)

    m_pad = k.shape[0]
    if m_actual != m_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < m_actual, logits, -jnp.inf)

    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits)
    denom = jnp.sum(p, axis=-1, keepdims=True)

    pc = p.astype(v.dtype)
    # One (TN, M) @ (M, 2D) matmul for both reductions: D=64 alone fills only
    # half the MXU's 128 output columns.
    vv = jnp.concatenate([v, jnp.square(v)], axis=-1)
    both = jax.lax.dot_general(
        pc, vv, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / denom
    d = v.shape[-1]
    m1 = both[:, :d]
    e2 = both[:, d:]

    s = jnp.sqrt(jnp.clip(e2 - jnp.square(m1), min=1e-6))
    o_ref[0] = (s * f_ref[0].astype(jnp.float32) + m1).astype(o_ref.dtype)


def _pad_axis(x, axis, size):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _block_sizes(n, m, block_n, block_m):
    tn = min(block_n, max(128, 1 << (n - 1).bit_length()))
    tm = min(block_m, max(128, 1 << (m - 1).bit_length()))
    n_pad = -(-n // tn) * tn
    m_pad = -(-m // tm) * tm
    return tn, tm, n_pad, m_pad


def _mhada_pallas_fwd_impl(q, k, v, fcs_n, block_n: int = 256):
    """Single-pass forward pallas_call — see mhada_attention_pallas."""
    b, h, n, d = q.shape
    m = k.shape[2]
    bh = b * h

    tn = min(block_n, max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // tn) * tn
    m_pad = -(-m // 128) * 128

    qf = _pad_axis(q.reshape(bh, n, d), 1, n_pad)
    ff = _pad_axis(fcs_n.reshape(bh, n, d), 1, n_pad)
    kf = _pad_axis(k.reshape(bh, m, d), 1, m_pad)
    vf = _pad_axis(v.reshape(bh, m, d), 1, m_pad)

    grid = (bh, n_pad // tn)
    out = pl.pallas_call(
        functools.partial(_kernel, m_actual=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * n_pad * m_pad * d * 3,
            bytes_accessed=4 * bh * (2 * n_pad * d + 2 * m_pad * d + n_pad * d),
            transcendentals=bh * n_pad * m_pad,
        ),
    )(qf, kf, vf, ff)

    return out[:, :n].reshape(b, h, n, d)


# --------------------------------------------- fused-prologue forward kernel


def _fused_kernel(fc_ref, fcs_ref, st_ref, wf_ref, fb_ref, k_ref, v_ref,
                  o_ref, *, d: int, m_actual: int):
    """Token-major single-pass kernel, two heads per 128-lane program, with
    the per-head prologue fused in:

        q     = ((fc - mean_fc) * rstd_fc) @ Wf + bf
        fcs_n = (fcs - mean_fcs) * rstd_fcs

    computed in VMEM from raw token slices — the normalised/projected
    tensors never exist in HBM, and no head-split transposes exist
    anywhere (inputs, K/V cache, and outputs are all (B, N|M, C) slices).
    """
    f32 = jnp.float32
    st = st_ref[0]      # (4, 2d) f32: mean_fc, rstd_fc, mean_fcs, rstd_fcs
    fc2 = fc_ref[0]     # (TN, 2d)
    fs2 = fcs_ref[0]
    wf = wf_ref[0]      # (d, 2d): [head_a | head_b] output columns
    fb = fb_ref[0]      # (1, 2d)
    k2 = k_ref[0]       # (M, 2d)
    v2 = v_ref[0]
    m_pad = k2.shape[0]

    for s in (0, d):
        qn = (fc2[:, s:s + d].astype(f32) - st[0:1, s:s + d]) \
            * st[1:2, s:s + d]
        q = jax.lax.dot_general(
            qn.astype(k2.dtype), wf[:, s:s + d],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + fb[:, s:s + d]  # (TN, d) f32

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
        denom = jnp.sum(p, axis=-1, keepdims=True)

        v_h = v2[:, s:s + d]
        vv = jnp.concatenate([v_h, jnp.square(v_h)], axis=-1)  # (M, 2d)
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


def mhada_fused_prologue(fc_tok, fcs_tok, stats, wf, fb, k, v,
                         block_n: int = 256):
    """Inference-only fused MHAda block core, fully token-major.

    fc_tok, fcs_tok: (B, N, C) RAW tokens (pre-IN); stats: (B, 4, C) f32
    rows [mean_fc, rstd_fc, mean_fcs, rstd_fcs] per channel; wf: (H, D, D)
    per-head Q projection; fb: (H, D); k, v: (B, M, C) token-major
    precomputed style keys/values (infer.image.precompute_style_kv).
    Returns (B, N, C).

    Forward-only (no VJP): training uses the unfused path, whose kernels
    carry the flash-style Pallas VJP.
    """
    b, n, c = fc_tok.shape
    hh, d, _ = wf.shape
    m = k.shape[1]
    assert d == 64 and c % 128 == 0, (d, c)
    pairs = c // 128
    if fc_tok.dtype.itemsize > 2:
        block_n = min(block_n, 128)  # f32: halve the tile (VMEM ceiling)
    tn = min(block_n, max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // tn) * tn
    m_pad = -(-m // 128) * 128

    fcp = _pad_axis(fc_tok, 1, n_pad)
    fsp = _pad_axis(fcs_tok, 1, n_pad)
    kp = _pad_axis(k, 1, m_pad)
    vp = _pad_axis(v, 1, m_pad)
    # (H, d, d) -> (pairs, d, 2d): output columns [head 2p | head 2p+1]
    wfp = wf.reshape(pairs, 2, d, d).transpose(0, 2, 1, 3) \
        .reshape(pairs, d, 2 * d)
    fbp = fb.reshape(pairs, 1, 2 * d)

    grid = (b, pairs, n_pad // tn)
    qspec = pl.BlockSpec((1, tn, 128), lambda i, p, j: (i, j, p),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, m_pad, 128), lambda i, p, j: (i, 0, p),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, d=d, m_actual=m),
        grid=grid,
        in_specs=[
            qspec,
            qspec,
            pl.BlockSpec((1, 4, 128), lambda i, p, j: (i, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, 128), lambda i, p, j: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i, p, j: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            kvspec,
            kvspec,
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
    )(fcp, fsp, stats.astype(jnp.float32), wfp, fbp, kp, vp)
    return out[:, :n]


# ------------------------------ token-major TRAINING MHAda kernel (VJP)


def _tm_res_kernel(q_ref, k_ref, v_ref, f_ref, o_ref, m1_ref, e2_ref,
                   lse_ref, *, d: int, m_actual: int):
    """Single-pass token-major MHAda core with residuals: two heads per
    128-lane program on (B, N|M, C) channel slices — the training twin of
    ``_fused_kernel`` (no prologue; emits M1/E2 + row lse for the VJP)."""
    f32 = jnp.float32
    q2 = q_ref[0]
    k2 = k_ref[0]
    v2 = v_ref[0]
    f2 = f_ref[0]
    m_pad = k2.shape[0]
    tn = q2.shape[0]
    for s in (0, d):
        logits = jax.lax.dot_general(
            q2[:, s:s + d], k2[:, s:s + d],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # unscaled softmax (reference adaDecoder.py:11-17)
        if m_actual != m_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < m_actual, logits, -jnp.inf)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mx)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        v_h = v2[:, s:s + d]
        vv = jnp.concatenate([v_h, jnp.square(v_h)], axis=-1)  # (M, 2d)
        both = jax.lax.dot_general(
            p.astype(v2.dtype), vv,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) / denom
        m1 = both[:, :d]
        e2 = both[:, d:]
        sd = jnp.sqrt(jnp.clip(e2 - jnp.square(m1), min=1e-6))
        o_ref[0, :, s:s + d] = (
            sd * f2[:, s:s + d].astype(f32) + m1).astype(o_ref.dtype)
        m1_ref[0, :, s:s + d] = m1
        e2_ref[0, :, s:s + d] = e2
        lse_ref[0, :, s:s + d] = jnp.broadcast_to(
            mx + jnp.log(denom), (tn, d))


def _mhada_tm_fwd_impl(q, k, v, fcs_n, num_heads, block_n, with_res):
    """q, fcs_n: (B, N, C); k, v: (B, M, C) — all token-major, heads as
    contiguous 64-channel slices."""
    b, n, c = q.shape
    m = k.shape[1]
    d = c // num_heads
    pairs = c // 128
    if q.dtype.itemsize > 2:
        block_n = min(block_n, max(128, block_n // 2))
    tn = min(block_n, max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // tn) * tn
    m_pad = -(-m // 128) * 128

    qp = _pad_axis(q, 1, n_pad)
    fp = _pad_axis(fcs_n, 1, n_pad)
    kp = _pad_axis(k, 1, m_pad)
    vp = _pad_axis(v, 1, m_pad)

    grid = (b, pairs, n_pad // tn)
    qspec = pl.BlockSpec((1, tn, 128), lambda i, p, j: (i, j, p),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, m_pad, 128), lambda i, p, j: (i, 0, p),
                          memory_space=pltpu.VMEM)
    out, m1, e2, lse = pl.pallas_call(
        functools.partial(_tm_res_kernel, d=d, m_actual=m),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, qspec],
        out_specs=[qspec, qspec, qspec, qspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, c), q.dtype),
            jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (c // 64) * n_pad * m_pad * 64 * 3,
            bytes_accessed=2 * b * (2 * n_pad * c + 2 * m_pad * c)
            + 12 * b * n_pad * c,
            transcendentals=b * (c // 64) * n_pad * m_pad,
        ),
    )(qp, kp, vp, fp)
    if not with_res:
        return out[:, :n]
    return out[:, :n], m1[:, :n], e2[:, :n], lse[:, :n]


def _mhada_tm_bwd_kernel(q_ref, k_ref, v_ref, dm1_ref, de2_ref, lse_ref,
                         delta_ref, dq_ref, dk_ref, dv_ref, acc_dk, acc_dv,
                         *, d: int, m_actual: int, n_nb: int):
    """Combined dQ+dK+dV, token-major: the MHAda twin of
    attention_pallas._tm_bwd_kernel.  acc_dv holds [P^T dM1 | P^T dE2] per
    head ((M, 128) halves at 2*s); the finalize applies the V-chain rule
    dV = P^T dM1 + 2 V * (P^T dE2)."""
    jn = pl.program_id(2)

    @pl.when(jn == 0)
    def _init():
        acc_dk[...] = jnp.zeros(acc_dk.shape, acc_dk.dtype)
        acc_dv[...] = jnp.zeros(acc_dv.shape, acc_dv.dtype)

    q2 = q_ref[0]
    k2 = k_ref[0]
    v2 = v_ref[0]
    m_pad = k2.shape[0]
    for s in (0, d):
        logits = jax.lax.dot_general(
            q2[:, s:s + d], k2[:, s:s + d],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jnp.exp(logits - lse_ref[0][:, s:s + 1])
        if m_actual != m_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
            p = jnp.where(col < m_actual, p, 0.0)
        g2_h = jnp.concatenate(
            [dm1_ref[0][:, s:s + d], de2_ref[0][:, s:s + d]], axis=-1)
        acc_dv[:, 2 * s:2 * s + 2 * d] += jax.lax.dot_general(
            p.astype(g2_h.dtype), g2_h,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        v_h = v2[:, s:s + d]
        vv = jnp.concatenate([v_h, jnp.square(v_h)], axis=-1)
        da = jax.lax.dot_general(
            g2_h, vv, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dl = p * (da - delta_ref[0][:, s:s + 1])
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
        for s in (0, d):
            w = acc_dv[:, 2 * s:2 * s + 2 * d]
            dv = w[:, :d] + 2.0 * v2[:, s:s + d] * w[:, d:]
            dv_ref[0, :, s:s + d] = dv.astype(dv_ref.dtype)


def _mhada_tm_bwd_impl(q, k, v, fcs_n, m1, e2, lse, g, num_heads):
    b, n, c = q.shape
    m = k.shape[1]
    d = c // num_heads
    pairs = c // 128
    f32 = jnp.float32

    # elementwise prologue, all token-major (B, N, C) — no transposes
    gf = g.astype(f32)
    ff = fcs_n.astype(f32)
    var = e2 - jnp.square(m1)
    s_std = jnp.sqrt(jnp.clip(var, min=1e-6))
    d_f = gf * s_std
    # clamp gradient: zero where Var < 1e-6 (torch semantics,
    # adaDecoder.py:191)
    d_var = jnp.where(var >= 1e-6, gf * ff * 0.5 / s_std, 0.0)
    d_m1 = gf - 2.0 * m1 * d_var
    d_e2 = d_var
    # softmax-Jacobian row term per head, broadcast over its 64 lanes
    delta = jnp.sum(
        (d_m1 * m1 + d_e2 * e2).reshape(b, n, 2 * pairs, 64), axis=-1)
    delta = jnp.repeat(delta, 64, axis=-1)  # (b, n, c) f32
    # ship the prologue products in the input dtype (flash-bwd convention)
    d_m1 = d_m1.astype(q.dtype)
    d_e2 = d_e2.astype(q.dtype)

    small = 2 if q.dtype.itemsize > 2 else 1
    m_pad = -(-m // 128) * 128
    tn = min((512 if m_pad <= 1024 else 256) // small,
             max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // tn) * tn
    qp = _pad_axis(q, 1, n_pad)
    kp = _pad_axis(k, 1, m_pad)
    vp = _pad_axis(v, 1, m_pad)
    dm1p = _pad_axis(d_m1, 1, n_pad)
    de2p = _pad_axis(d_e2, 1, n_pad)
    lse_p = _pad_axis(lse, 1, n_pad)
    delta_p = _pad_axis(delta, 1, n_pad)
    n_nb = n_pad // tn

    rowspec = pl.BlockSpec((1, tn, 128), lambda i, p, j: (i, j, p),
                           memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, m_pad, 128), lambda i, p, j: (i, 0, p),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_mhada_tm_bwd_kernel, d=d, m_actual=m,
                          n_nb=n_nb),
        grid=(b, pairs, n_nb),
        in_specs=[rowspec, kvspec, kvspec, rowspec, rowspec, rowspec,
                  rowspec],
        out_specs=[rowspec, kvspec, kvspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, c), q.dtype),
            jax.ShapeDtypeStruct((b, m_pad, c), k.dtype),
            jax.ShapeDtypeStruct((b, m_pad, c), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((m_pad, 128), f32),
            pltpu.VMEM((m_pad, 256), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (c // 64) * n_pad * m_pad * 64 * 7,
            bytes_accessed=2 * b * (3 * n_pad * c + 2 * m_pad * c) * 2
            + 8 * b * n_pad * c,
            transcendentals=b * (c // 64) * n_pad * m_pad,
        ),
    )(qp, kp, vp, dm1p, de2p, lse_p, delta_p)
    return (dq[:, :n], dk[:, :m], dv[:, :m], d_f.astype(fcs_n.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def mhada_tm_train(q, k, v, fcs_n, num_heads, block_n=256):
    """Differentiable token-major MHAda attention: q, fcs_n (B, N, C);
    k, v (B, M, C) -> (B, N, C), heads as contiguous 64-channel slices
    (reference adaDecoder.py:168-170 packing).  The training twin of
    ``mhada_fused_prologue``'s core: removes every XLA head-split
    transpose per block (5 tensors), forward and backward.  Single-pass
    (keys VMEM-resident): callers route only M <= 2048 here."""
    return _mhada_tm_fwd_impl(q, k, v, fcs_n, num_heads, block_n,
                              with_res=False)


def _mhada_tm_fwd(q, k, v, fcs_n, num_heads, block_n):
    # widened training forward tile, capped so the per-head (TN, M) f32
    # logit tile stays <= 4 MB (see attention_pallas._attn_tm_fwd)
    m_pad = -(-k.shape[1] // 128) * 128
    tn = max(block_n, min(1024, max(256, (1 << 20) // m_pad)))
    out, m1, e2, lse = _mhada_tm_fwd_impl(
        q, k, v, fcs_n, num_heads, tn, with_res=True)
    return out, (q, k, v, fcs_n, m1, e2, lse)


def _mhada_tm_bwd(num_heads, block_n, res, g):
    q, k, v, fcs_n, m1, e2, lse = res
    return _mhada_tm_bwd_impl(q, k, v, fcs_n, m1, e2, lse, g, num_heads)


mhada_tm_train.defvjp(_mhada_tm_fwd, _mhada_tm_bwd)


# ------------------------------------------------- streaming forward kernel


def _stream_kernel(q_ref, k_ref, v_ref, f_ref, *refs,
                   m_actual: int, tm: int, n_mb: int, with_res: bool):
    if with_res:
        o_ref, m1e2_ref, lse_ref, m_scr, l_scr, acc_scr = refs
    else:
        o_ref, m_scr, l_scr, acc_scr = refs
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, m_scr.dtype)
        l_scr[...] = jnp.zeros(l_scr.shape, l_scr.dtype)
        acc_scr[...] = jnp.zeros(acc_scr.shape, acc_scr.dtype)

    q = q_ref[0]  # (TN, D)
    k = k_ref[0]  # (TM, D)
    v = v_ref[0]  # (TM, D)

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TN, TM)
    if m_actual % tm != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * tm
        logits = jnp.where(col < m_actual, logits, -jnp.inf)

    m_prev = m_scr[:, :1]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)

    vv = jnp.concatenate([v, jnp.square(v)], axis=-1)  # (TM, 2D)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), vv, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[...] = acc_scr[...] * alpha + pv
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == n_mb - 1)
    def _finalize():
        l = l_scr[:, :1]
        both = acc_scr[...] / l
        d = q.shape[-1]
        m1 = both[:, :d]
        e2 = both[:, d:]
        s = jnp.sqrt(jnp.clip(e2 - jnp.square(m1), min=1e-6))
        o_ref[0] = (s * f_ref[0].astype(jnp.float32) + m1).astype(o_ref.dtype)
        if with_res:
            m1e2_ref[0] = both
            lse_ref[0] = jnp.broadcast_to(
                m_scr[:, :1] + jnp.log(l), lse_ref.shape[1:])


def _mhada_stream_fwd_impl(q, k, v, fcs_n, block_n: int, block_m: int,
                           with_res: bool):
    """Streaming forward.  Returns out or (out, m1e2, lse)."""
    b, h, n, d = q.shape
    m = k.shape[2]
    bh = b * h
    tn, tm, n_pad, m_pad = _block_sizes(n, m, block_n, block_m)

    qf = _pad_axis(q.reshape(bh, n, d), 1, n_pad)
    ff = _pad_axis(fcs_n.reshape(bh, n, d), 1, n_pad)
    kf = _pad_axis(k.reshape(bh, m, d), 1, m_pad)
    vf = _pad_axis(v.reshape(bh, m, d), 1, m_pad)

    n_mb = m_pad // tm
    grid = (bh, n_pad // tn, n_mb)

    qspec = pl.BlockSpec((1, tn, d), lambda i, jn, jm: (i, jn, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, tm, d), lambda i, jn, jm: (i, jm, 0),
                          memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((1, tn, d), lambda i, jn, jm: (i, jn, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype)]
    if with_res:
        out_specs += [
            pl.BlockSpec((1, tn, 2 * d), lambda i, jn, jm: (i, jn, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, _LANES), lambda i, jn, jm: (i, jn, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((bh, n_pad, 2 * d), jnp.float32),
            jax.ShapeDtypeStruct((bh, n_pad, _LANES), jnp.float32),
        ]

    res = pl.pallas_call(
        functools.partial(_stream_kernel, m_actual=m, tm=tm, n_mb=n_mb,
                          with_res=with_res),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, qspec],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((tn, _LANES), jnp.float32),
            pltpu.VMEM((tn, _LANES), jnp.float32),
            pltpu.VMEM((tn, 2 * d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * n_pad * m_pad * d * 3,
            bytes_accessed=4 * bh * (3 * n_pad * d + 2 * m_pad * d),
            transcendentals=bh * n_pad * m_pad,
        ),
    )(qf, kf, vf, ff)

    out = res[0][:, :n].reshape(b, h, n, d)
    if not with_res:
        return out
    m1e2 = res[1][:, :n].reshape(b, h, n, 2 * d)
    lse = res[2][:, :n, 0].reshape(b, h, n)
    return out, m1e2, lse


# ------------------------------------------------ streaming backward kernels


def _bwd_dq_kernel(q_ref, k_ref, v_ref, g2_ref, lse_ref, delta_ref,
                   dq_ref, acc_scr, *, m_actual: int, tm: int, n_mb: int):
    """Accumulates dQ for one query block while streaming key blocks.

    g2 = [d_M1, d_E2] (TN, 2D);  dA = g2 @ [V, V^2]^T;
    dlogits = P * (dA - delta);  dQ += dlogits @ K.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_scr[...] = jnp.zeros(acc_scr.shape, acc_scr.dtype)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]  # input dtype: vv feeds an MXU matmul (f32 accumulate)

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = jnp.exp(logits - lse_ref[0][:, :1])
    if m_actual % tm != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) + j * tm
        p = jnp.where(col < m_actual, p, 0.0)

    vv = jnp.concatenate([v, jnp.square(v)], axis=-1)  # (TM, 2D)
    da = jax.lax.dot_general(
        g2_ref[0], vv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TN, TM)
    dl = p * (da - delta_ref[0][:, :1])
    acc_scr[...] += jax.lax.dot_general(
        dl.astype(k.dtype), k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_mb - 1)
    def _finalize():
        dq_ref[0] = acc_scr[...].astype(dq_ref.dtype)


def _bwd_combined_kernel(q_ref, k_ref, v_ref, g2_ref, lse_ref, delta_ref,
                         dq_ref, dk_ref, dv_ref, acc_dk, acc_dv,
                         *, m_actual: int, tm: int, n_nb: int):
    """dQ + dK + dV in ONE pass — valid when the whole key set fits one
    block (m_pad == tm, the training regime: M=1024 style tokens).

    The two-kernel path recomputes P = exp(QK^T - lse) and dA twice (once
    per pass); here logits/P/dA/dlogits are computed once and feed all
    three outputs — ~30% fewer backward FLOPs and half the exp traffic.
    dQ writes per query block; dK/dV accumulate across the sequential
    query-block grid dim into constant-indexed output blocks."""
    jn = pl.program_id(1)

    @pl.when(jn == 0)
    def _init():
        acc_dk[...] = jnp.zeros(acc_dk.shape, acc_dk.dtype)
        acc_dv[...] = jnp.zeros(acc_dv.shape, acc_dv.dtype)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]  # input dtype: vv feeds an MXU matmul (f32 accumulate)
    g2 = g2_ref[0]  # (TN, 2D), input dtype

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TN, TM)
    p = jnp.exp(logits - lse_ref[0][:, :1])
    if m_actual % tm != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        p = jnp.where(col < m_actual, p, 0.0)

    acc_dv[...] += jax.lax.dot_general(
        p.astype(g2.dtype), g2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    vv = jnp.concatenate([v, jnp.square(v)], axis=-1)
    da = jax.lax.dot_general(
        g2, vv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dl = p * (da - delta_ref[0][:, :1])
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
        d = v.shape[-1]
        dk_ref[0] = acc_dk[...].astype(dk_ref.dtype)
        dv = acc_dv[:, :d] + 2.0 * v * acc_dv[:, d:]
        dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_dkv_kernel(k_ref, v_ref, q_ref, g2_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, acc_dk, acc_dv,
                    *, m_actual: int, tm: int, n_nb: int):
    """Accumulates dK, dV for one key block while streaming query blocks.

    dV = P^T d_M1 + 2 V * (P^T d_E2);  dK = dlogits^T @ Q.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_dk[...] = jnp.zeros(acc_dk.shape, acc_dk.dtype)
        acc_dv[...] = jnp.zeros(acc_dv.shape, acc_dv.dtype)

    jm = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]  # input dtype: vv feeds an MXU matmul (f32 accumulate)
    g2 = g2_ref[0]  # (TN, 2D), input dtype

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TN, TM)
    p = jnp.exp(logits - lse_ref[0][:, :1])
    if m_actual % tm != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) + jm * tm
        p = jnp.where(col < m_actual, p, 0.0)

    # P^T @ [d_M1, d_E2] -> (TM, 2D)
    acc_dv[...] += jax.lax.dot_general(
        p.astype(g2.dtype), g2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    vv = jnp.concatenate([v, jnp.square(v)], axis=-1)
    da = jax.lax.dot_general(
        g2, vv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dl = p * (da - delta_ref[0][:, :1])
    acc_dk[...] += jax.lax.dot_general(
        dl.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_nb - 1)
    def _finalize():
        d = v.shape[-1]
        dk_ref[0] = acc_dk[...].astype(dk_ref.dtype)
        dv = acc_dv[:, :d] + 2.0 * v * acc_dv[:, d:]
        dv_ref[0] = dv.astype(dv_ref.dtype)


def _mhada_stream_bwd_impl(q, k, v, fcs_n, m1e2, lse, g,
                           block_n: int, block_m: int,
                           g_f32: bool = False):
    """Flash-style backward: elementwise prologue in XLA, then two kernels."""
    b, h, n, d = q.shape
    m = k.shape[2]
    bh = b * h
    tn, tm, n_pad, m_pad = _block_sizes(n, m, block_n, block_m)

    f32 = jnp.float32
    gf = g.astype(f32)
    ff = fcs_n.astype(f32)
    m1 = m1e2[..., :d]
    e2 = m1e2[..., d:]
    var = e2 - jnp.square(m1)
    s = jnp.sqrt(jnp.clip(var, min=1e-6))
    d_f = gf * s
    # clamp gradient: zero where Var < 1e-6 (torch semantics, adaDecoder.py:191)
    d_var = jnp.where(var >= 1e-6, gf * ff * 0.5 / s, 0.0)
    d_m1 = gf - 2.0 * m1 * d_var
    d_e2 = d_var
    # softmax-Jacobian row term: sum_m A_nm dA_nm = d_M1.M1 + d_E2.E2
    delta = jnp.sum(d_m1 * m1 + d_e2 * e2, axis=-1)  # (b, h, n)

    # g2 ships in the INPUT dtype (flash-bwd convention: dO in compute
    # precision, f32 accumulation) — the f32 prologue math above is done,
    # and keeping g2 f32 made the kernels' dV = P^T@G2 and dA = G2@[V|V^2]^T
    # matmuls run with f32 operands (multiple MXU passes + 2x DMA); in bf16
    # training those two are ~57% of the backward FLOPs.
    # (g_f32=True restores the pre-r5 f32-shipped g2 — A/B hook for
    # scripts/bwd_qtile_probe.py only.)
    g2 = jnp.concatenate([d_m1, d_e2], axis=-1).astype(
        jnp.float32 if g_f32 else q.dtype)
    g2f = _pad_axis(g2.reshape(bh, n, 2 * d), 1, n_pad)
    qf = _pad_axis(q.reshape(bh, n, d), 1, n_pad)
    kf = _pad_axis(k.reshape(bh, m, d), 1, m_pad)
    vf = _pad_axis(v.reshape(bh, m, d), 1, m_pad)
    # padded query rows: lse = +big so P = exp(logits - lse) == 0 exactly
    lse_f = jnp.full((bh, n_pad, _LANES), _LSE_PAD, f32)
    lse_f = lse_f.at[:, :n, :].set(lse.reshape(bh, n, 1))
    delta_f = _pad_axis(
        jnp.broadcast_to(delta.reshape(bh, n, 1), (bh, n, _LANES)), 1, n_pad
    )

    qspec = pl.BlockSpec((1, tn, d), lambda i, jn, jm: (i, jn, 0),
                         memory_space=pltpu.VMEM)
    g2spec = pl.BlockSpec((1, tn, 2 * d), lambda i, jn, jm: (i, jn, 0),
                          memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, tn, _LANES), lambda i, jn, jm: (i, jn, 0),
                           memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, tm, d), lambda i, jn, jm: (i, jm, 0),
                          memory_space=pltpu.VMEM)

    n_nb = n_pad // tn
    n_mb = m_pad // tm

    if n_mb == 1:
        # whole key set in one block (training shapes): dQ/dK/dV in one
        # pass — logits/P/dA computed once instead of once per kernel
        qspec1 = pl.BlockSpec((1, tn, d), lambda i, jn: (i, jn, 0),
                              memory_space=pltpu.VMEM)
        g2spec1 = pl.BlockSpec((1, tn, 2 * d), lambda i, jn: (i, jn, 0),
                               memory_space=pltpu.VMEM)
        rowspec1 = pl.BlockSpec((1, tn, _LANES), lambda i, jn: (i, jn, 0),
                                memory_space=pltpu.VMEM)
        kvspec1 = pl.BlockSpec((1, tm, d), lambda i, jn: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_combined_kernel, m_actual=m, tm=tm,
                              n_nb=n_nb),
            grid=(bh, n_nb),
            in_specs=[qspec1, kvspec1, kvspec1, g2spec1, rowspec1,
                      rowspec1],
            out_specs=[qspec1, kvspec1, kvspec1],
            out_shape=[
                jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
                jax.ShapeDtypeStruct((bh, m_pad, d), k.dtype),
                jax.ShapeDtypeStruct((bh, m_pad, d), v.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((tm, d), f32),
                pltpu.VMEM((tm, 2 * d), f32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(qf, kf, vf, g2f, lse_f, delta_f)
        return (
            dq[:, :n].reshape(b, h, n, d),
            dk[:, :m].reshape(b, h, m, d),
            dv[:, :m].reshape(b, h, m, d),
            d_f.astype(fcs_n.dtype),
        )

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, m_actual=m, tm=tm, n_mb=n_mb),
        grid=(bh, n_nb, n_mb),
        in_specs=[qspec, kvspec, kvspec, g2spec, rowspec, rowspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((tn, d), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf, vf, g2f, lse_f, delta_f)

    # key-block outer, query-block inner
    kvspec2 = pl.BlockSpec((1, tm, d), lambda i, jm, jn: (i, jm, 0),
                           memory_space=pltpu.VMEM)
    qspec2 = pl.BlockSpec((1, tn, d), lambda i, jm, jn: (i, jn, 0),
                          memory_space=pltpu.VMEM)
    g2spec2 = pl.BlockSpec((1, tn, 2 * d), lambda i, jm, jn: (i, jn, 0),
                           memory_space=pltpu.VMEM)
    rowspec2 = pl.BlockSpec((1, tn, _LANES), lambda i, jm, jn: (i, jn, 0),
                            memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, m_actual=m, tm=tm, n_nb=n_nb),
        grid=(bh, n_mb, n_nb),
        in_specs=[kvspec2, kvspec2, qspec2, g2spec2, rowspec2, rowspec2],
        out_specs=[kvspec2, kvspec2],
        out_shape=[
            jax.ShapeDtypeStruct((bh, m_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, m_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tm, d), f32),
            pltpu.VMEM((tm, 2 * d), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(kf, vf, qf, g2f, lse_f, delta_f)

    return (
        dq[:, :n].reshape(b, h, n, d),
        dk[:, :m].reshape(b, h, m, d),
        dv[:, :m].reshape(b, h, m, d),
        d_f.astype(fcs_n.dtype),
    )


# ------------------------------------------------------------------ wiring


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _mhada_custom(q, k, v, fcs_n, block_n, block_m, streaming):
    if streaming:
        return _mhada_stream_fwd_impl(q, k, v, fcs_n, block_n, block_m,
                                      with_res=False)
    return _mhada_pallas_fwd_impl(q, k, v, fcs_n, block_n)


def _mhada_fwd(q, k, v, fcs_n, block_n, block_m, streaming):
    # Training forward: widen the query tile (1024 bf16 / 512 f32) — same
    # r5 fwd-tile A/B rationale as attention_pallas._attn_fwd.
    tn = max(block_n, 1024 // (2 if q.dtype.itemsize > 2 else 1))
    out, m1e2, lse = _mhada_stream_fwd_impl(
        q, k, v, fcs_n, tn, block_m, with_res=True)
    return out, (q, k, v, fcs_n, m1e2, lse)


def _mhada_bwd(block_n, block_m, streaming, res, g):
    q, k, v, fcs_n, m1e2, lse = res
    # Measured tile policy (scripts/bwd_tile_probe.py + the m=2048 A/B):
    # query tile 512, key block 1024 at every m — at m <= 1024 the
    # combined one-pass kernel engages (2.62 vs 3.42 ms for the old
    # (256, 512) two-pass at the training shape); at m = 2048 the
    # (512, 1024) two-pass measured 2.54 vs 4.68 for (256, 1024) and
    # 2.79 for the combined (512, 2048) variant.  f32 halves the query
    # tile (score-tile VMEM).
    tn = 256 if q.dtype.itemsize > 2 else 512
    # trace-time A/B hook (scripts/train_qtile_ab.py): ship g2 in f32 as
    # the pre-r5 impls did
    g_f32 = bool(int(os.environ.get("MHADA_BWD_G_F32", "0")))
    return _mhada_stream_bwd_impl(q, k, v, fcs_n, m1e2, lse, g,
                                  tn, min(block_m, 1024), g_f32=g_f32)


_mhada_custom.defvjp(_mhada_fwd, _mhada_bwd)


def mhada_attention_pallas(q, k, v, fcs_n, block_n: int | None = None,
                           block_m: int | None = None,
                           streaming: bool | None = None):
    """Drop-in replacement for ops.mhada.mhada_attention (softmax activation).

    q, fcs_n: (B, H, N, D); k, v: (B, H, M, D).  Returns (B, H, N, D).
    ``streaming=None`` auto-selects: single-pass (K/V VMEM-resident) up to
    M=4096, flash-style key streaming beyond.  Differentiable: the VJP runs
    the streaming forward (saving M1/E2 + row lse) and two flash-style
    backward kernels — nothing materialises the (N, M) attention matrix.

    Default tiles: single-pass (256, m); streaming (512, 2048), widened to
    (1024, 2048) query rows once the key set is deep (M >= 8192) — the
    round-5 sweep (scripts/stream_tile_probe.py at N=M=16384 bf16):
    (1024, 2048) 11.12 ms / 74.2 TF/s vs the old (512, 2048) 12.53 / 65.8;
    halving the grid steps amortises the ~15 us/step Pallas floor
    scripts/mxu_probe.py measured.  Halved for f32 (VMEM).
    """
    if streaming is None:
        streaming = k.shape[2] > SINGLE_PASS_MAX_M
    small = 2 if q.dtype.itemsize > 2 else 1
    if block_n is None:
        deep = streaming and k.shape[2] >= 8192
        block_n = ((1024 if deep else 512) if streaming else 256) // small
    if block_m is None:
        block_m = 2048 // small
    return _mhada_custom(q, k, v, fcs_n, block_n, block_m, bool(streaming))
