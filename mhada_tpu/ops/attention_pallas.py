"""Fused Pallas TPU kernel for standard scaled-dot-product self-attention.

Used by the ViT encoder blocks in ``spatial`` mode at inference: at 512^2 the
token grid is 4096 and XLA's unfused path materialises (H, 4096, 4096) f32
logits in HBM per block (~512 MB), which dominates encoder latency.  Here the
(TN, M) score tile lives only in VMEM; K/V stay VMEM-resident per (b, h).

Same single-pass structure as ops/mhada_pallas.py (keys fit VMEM; no online
softmax needed).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _pad_axis(x, axis, size):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _attention_pallas_call(q, k, v, scale: float, block_n: int = 256):
    """softmax(q k^T * scale) v for (B, H, N, D) / (B, H, M, D) inputs."""
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


def _attn_fwd_impl(q, k, v, scale, block_n=256):
    return _attention_pallas_call(q, k, v, scale, block_n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attn_custom(q, k, v, scale, block_n):
    return _attn_fwd_impl(q, k, v, scale, block_n)


def _attn_fwd(q, k, v, scale, block_n):
    return _attn_fwd_impl(q, k, v, scale, block_n), (q, k, v)


def _attn_bwd(scale, block_n, res, g):
    """Standard softmax-attention backward, A rematerialised in XLA."""
    q, k, v = res
    f32 = jnp.float32
    qf, kf, vf, gf = (x.astype(f32) for x in (q, k, v, g))
    a = jax.nn.softmax(
        jnp.einsum("bhnd,bhmd->bhnm", qf, kf) * scale, axis=-1
    )
    d_v = jnp.einsum("bhnm,bhnd->bhmd", a, gf)
    d_a = jnp.einsum("bhnd,bhmd->bhnm", gf, vf)
    d_logits = a * (d_a - jnp.sum(d_a * a, axis=-1, keepdims=True))
    d_q = jnp.einsum("bhnm,bhmd->bhnd", d_logits, kf) * scale
    d_k = jnp.einsum("bhnm,bhnd->bhmd", d_logits, qf) * scale
    return d_q.astype(q.dtype), d_k.astype(k.dtype), d_v.astype(v.dtype)


_attn_custom.defvjp(_attn_fwd, _attn_bwd)


def attention_pallas(q, k, v, scale: float, block_n: int = 256):
    """Fused attention with a custom VJP (XLA-rematerialised backward) so the
    encoder can train through the kernel."""
    return _attn_custom(q, k, v, scale, block_n)
