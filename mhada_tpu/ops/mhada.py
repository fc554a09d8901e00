"""Multi-head adaptive attention (MHAda) — the framework's core op.

Reference semantics (network/adaDecoder.py:134-206): split channels into
heads; per head build Q = f(IN(fc)), K = g(IN(fs)), V = h(fs) via 1x1 convs,
form the *unscaled* attention A = softmax(Q K^T) (note: NO 1/sqrt(d) factor,
adaDecoder.py:11-17), and apply AdaIN-style statistics matching:

    M = A V,   Var = A V^2 - M^2,   S = sqrt(clamp(Var, 1e-6))
    out_head = S * IN(fcs_head) + M

Heads concat + 1x1 output conv.

TPU-first design: the reference loops over heads in Python with per-head
ModuleLists; here all heads are batched into single einsums (MXU-shaped), and
per-head 1x1 convs become a (heads, d, d) batched matmul.  The instance norms
are per-channel over tokens, so slicing into heads commutes with IN and we
normalise once over the full channel dim.  A fused flash-style Pallas kernel
(ops/mhada_pallas.py) replaces the materialised-A path for large grids.
"""

import jax.numpy as jnp

from .instance_norm import instance_norm_tokens


def _cosine_attention(q: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Reference CosineSimilarity activation: a = (cos(q,k)+1), row-normalised.

    q: (..., n, d), k: (..., m, d) -> (..., n, m)
    """
    qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
    kn = jnp.linalg.norm(k, axis=-1, keepdims=True)
    s = jnp.einsum("...nd,...md->...nm", q, k) / (
        qn * jnp.swapaxes(kn, -1, -2)
    ) + 1.0
    return s / jnp.sum(s, axis=-1, keepdims=True)


def mhada_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    fcs_n: jnp.ndarray,
    activation: str = "softmax",
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Batched-head adaptive attention core.

    q:     (B, H, Nq, D)  projected, instance-normed content queries
    k:     (B, H, Nk, D)  projected, instance-normed style keys
    v:     (B, H, Nk, D)  projected style values (raw, not normed)
    fcs_n: (B, H, Nq, D)  instance-normed current stylised features
    returns (B, H, Nq, D): S * fcs_n + M  (per reference adaDecoder.py:186-198)

    ``use_pallas`` dispatches to the fused kernel (ops/mhada_pallas.py):
    single-pass VMEM-resident up to M=4096, flash-style key streaming
    beyond, with a flash-style Pallas VJP — fully differentiable.  This
    naive einsum formulation is the CPU path and the test oracle.
    """
    if use_pallas and activation == "softmax":
        from .mhada_pallas import mhada_attention_pallas

        return mhada_attention_pallas(q, k, v, fcs_n)
    f32 = jnp.float32
    if activation == "softmax":
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=f32)
        a = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
        a = a / jnp.sum(a, axis=-1, keepdims=True)
    elif activation == "cosine":
        a = _cosine_attention(q, k).astype(f32)
    else:
        raise ValueError(f"Unknown activation function: {activation}")

    vf = v.astype(f32)
    m = jnp.einsum("bhnm,bhmd->bhnd", a, vf, preferred_element_type=f32)
    e2 = jnp.einsum("bhnm,bhmd->bhnd", a, jnp.square(vf), preferred_element_type=f32)
    var = e2 - jnp.square(m)
    s = jnp.sqrt(jnp.clip(var, min=1e-6))
    return (s * fcs_n.astype(f32) + m).astype(q.dtype)


def adaattn_single(
    c_x: jnp.ndarray,
    s_x: jnp.ndarray,
    c_1x: jnp.ndarray,
    s_1x: jnp.ndarray,
    activation: str = "softmax",
) -> jnp.ndarray:
    """Parameter-free AdaAttN used inside the local-feature loss.

    Token layout (B, N, C).  Reference adaDecoder.py:38-81: Q = IN(c_1x),
    K = IN(s_1x), V = s_x raw; output S * IN(c_x) + M.
    """
    q = instance_norm_tokens(c_1x)
    k = instance_norm_tokens(s_1x)
    cn = instance_norm_tokens(c_x)
    out = mhada_attention(
        q[:, None], k[:, None], s_x[:, None], cn[:, None], activation
    )
    return out[:, 0]
