"""Fused Pallas TPU kernel for MHAda adaptive attention.

Computes, per (batch*head) slice, without materialising the (N, M) attention
matrix in HBM:

    A   = softmax(Q K^T)            (unscaled, reference adaDecoder.py:11-17)
    M1  = A V
    E2  = A V^2
    out = sqrt(clamp(E2 - M1^2, 1e-6)) * fcs_n + M1

Design (SURVEY.md §7 step 3): grid = (B*H, N/TN) with the key/value tensors
resident in VMEM per head (M,D <= 4096x64 -> ~2 MB bf16/f32, well under the
16 MB VMEM budget), one query block per program.  The (TN, M) score tile
lives only in VMEM; both reductions (A.V and A.V^2) reuse it.  Since the full
key axis is in VMEM there is no need for online-softmax streaming — one pass,
numerically identical to the naive version (max-subtracted softmax).

Key-axis padding is masked with -inf logits; the query axis is padded by the
caller and cropped after.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _mhada_pallas_fwd_impl(q, k, v, fcs_n, block_n: int = 256):
    """Forward pallas_call (no VJP wiring) — see mhada_attention_pallas."""
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _mhada_custom(q, k, v, fcs_n, block_n):
    return _mhada_pallas_fwd_impl(q, k, v, fcs_n, block_n)


def _mhada_fwd(q, k, v, fcs_n, block_n):
    out = _mhada_pallas_fwd_impl(q, k, v, fcs_n, block_n)
    return out, (q, k, v, fcs_n)


def _mhada_bwd(block_n, res, g):
    """Exact backward of the MHAda forward, recomputed in XLA.

    Recomputes A = softmax(QK^T) (flash-style rematerialisation: the forward
    never stored it), then backpropagates through

        M1 = A V,  E2 = A V^2,  S = sqrt(clamp(E2 - M1^2, 1e-6)),
        out = S * fcs_n + M1.

    clamp gradient: zero where Var < 1e-6 (torch clamp semantics,
    reference adaDecoder.py:191).
    """
    q, k, v, fcs_n = res
    f32 = jnp.float32
    qf, kf, vf, ff, gf = (x.astype(f32) for x in (q, k, v, fcs_n, g))

    logits = jnp.einsum("bhnd,bhmd->bhnm", qf, kf)
    a = jax.nn.softmax(logits, axis=-1)
    v2 = jnp.square(vf)
    m1 = jnp.einsum("bhnm,bhmd->bhnd", a, vf)
    e2 = jnp.einsum("bhnm,bhmd->bhnd", a, v2)
    var = e2 - jnp.square(m1)
    var_c = jnp.clip(var, min=1e-6)
    s = jnp.sqrt(var_c)

    d_f = gf * s
    d_s = gf * ff
    d_var = jnp.where(var >= 1e-6, d_s * 0.5 / s, 0.0)
    d_m1 = gf - 2.0 * m1 * d_var
    d_e2 = d_var

    d_a = (
        jnp.einsum("bhnd,bhmd->bhnm", d_m1, vf)
        + jnp.einsum("bhnd,bhmd->bhnm", d_e2, v2)
    )
    d_v = (
        jnp.einsum("bhnm,bhnd->bhmd", a, d_m1)
        + 2.0 * vf * jnp.einsum("bhnm,bhnd->bhmd", a, d_e2)
    )
    d_logits = a * (d_a - jnp.sum(d_a * a, axis=-1, keepdims=True))
    d_q = jnp.einsum("bhnm,bhmd->bhnd", d_logits, kf)
    d_k = jnp.einsum("bhnm,bhnd->bhmd", d_logits, qf)
    return (
        d_q.astype(q.dtype),
        d_k.astype(k.dtype),
        d_v.astype(v.dtype),
        d_f.astype(fcs_n.dtype),
    )


_mhada_custom.defvjp(_mhada_fwd, _mhada_bwd)


def mhada_attention_pallas(q, k, v, fcs_n, block_n: int = 256):
    """Drop-in replacement for ops.mhada.mhada_attention (softmax activation).

    q, fcs_n: (B, H, N, D); k, v: (B, H, M, D).  Returns (B, H, N, D).
    Differentiable: the forward runs the fused VMEM kernel; the backward
    rematerialises A in XLA (_mhada_bwd) with gradients matching the naive
    einsum formulation.
    """
    return _mhada_custom(q, k, v, fcs_n, block_n)
