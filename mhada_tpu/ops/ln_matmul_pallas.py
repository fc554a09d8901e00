"""Fused LayerNorm + matmul Pallas kernel (ViT pre-LN projections).

Every pre-LN site in the encoder (ln1 -> qkv projection, ln2 -> mlp_fc1;
reference vit.py:49-56) costs XLA an extra HBM round trip: read x, write
the normalised tensor, read it back for the matmul — ~8 MB of traffic per
site per frame at (8, 4096, 512) bf16, with f32 LN intermediates on top.
Here the normalisation happens in VMEM as the matmul's prologue: x is
read once, the normalised tile never exists in HBM.

Forward-only (inference builds) — training uses the unfused XLA path,
which has a VJP.  Engaged from models/vit.py::EncoderBlock when
``fuse_ln`` is set (TPU inference builds, models/layers.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_matmul_kernel(x_ref, s_ref, sb_ref, w_ref, b_ref, o_ref, *,
                      eps: float):
    x = x_ref[0].astype(jnp.float32)                     # (TN, E)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + eps)
    h = (h * s_ref[0] + sb_ref[0]).astype(w_ref.dtype)   # affine, cast
    o_ref[0] = (
        jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[0]
    ).astype(o_ref.dtype)


def _ln_matmul_pallas(x, scale, bias, w, b, eps: float = 1e-6):
    """The forward pallas_call — see ``ln_matmul`` for the public API."""
    bsz, n, e = x.shape
    f = w.shape[1]
    tn = next(t for t in (512, 256, 128, 64, 32, 16, 8) if n % t == 0)
    nt = n // tn

    out = pl.pallas_call(
        functools.partial(_ln_matmul_kernel, eps=eps),
        grid=(bsz * nt,),
        in_specs=[
            pl.BlockSpec((1, tn, e), lambda g, nt=nt: (g // nt, g % nt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, f), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tn, f), lambda g, nt=nt: (g // nt, g % nt, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, f), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * e * f,
            bytes_accessed=(x.dtype.itemsize * bsz * n * (e + f)
                            + w.dtype.itemsize * e * f),
            transcendentals=0,
        ),
    )(
        x,
        scale.astype(jnp.float32)[None],
        bias.astype(jnp.float32)[None],
        w.astype(x.dtype),
        b.astype(jnp.float32)[None],
    )
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _ln_matmul_custom(x, scale, bias, w, b, eps):
    return _ln_matmul_pallas(x, scale, bias, w, b, eps)


def _ln_stats(x, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    rsig = jax.lax.rsqrt(jnp.mean(xc * xc, axis=-1, keepdims=True) + eps)
    return xc * rsig  # hn, f32


def _ln_matmul_fwd(x, scale, bias, w, b, eps):
    out = _ln_matmul_pallas(x, scale, bias, w, b, eps)
    return out, (x, scale, bias, w)


def _ln_matmul_bwd(eps, res, g):
    """Closed-form XLA backward with LN rematerialised from x (one cheap
    bandwidth pass) — the round trip the fused forward saves is the HBM
    write+read of the normalised tensor, which the backward never needed.
    Matmul grads run in the compute dtype with f32 accumulation, LN grads
    in f32 — the same dtypes autodiff of the unfused path uses."""
    x, scale, bias, w = res
    f32 = jnp.float32
    hn = _ln_stats(x, eps)                               # (B, N, E) f32
    h = (hn * scale + bias).astype(x.dtype)
    dw = jnp.einsum("bne,bnf->ef", h, g,
                    preferred_element_type=f32).astype(w.dtype)
    db = jnp.sum(g.astype(f32), axis=(0, 1)).astype(w.dtype)
    dh = jnp.einsum("bnf,ef->bne", g, w.astype(g.dtype),
                    preferred_element_type=f32)          # (B, N, E) f32
    ds = jnp.sum(dh * hn, axis=(0, 1)).astype(scale.dtype)
    dsb = jnp.sum(dh, axis=(0, 1)).astype(scale.dtype)
    dhn = dh * scale.astype(f32)
    xf = x.astype(f32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    rsig = jax.lax.rsqrt(jnp.mean(xc * xc, axis=-1, keepdims=True) + eps)
    dx = rsig * (dhn
                 - jnp.mean(dhn, axis=-1, keepdims=True)
                 - hn * jnp.mean(dhn * hn, axis=-1, keepdims=True))
    return dx.astype(x.dtype), ds, dsb, dw, db


_ln_matmul_custom.defvjp(_ln_matmul_fwd, _ln_matmul_bwd)


def ln_matmul(x, scale, bias, w, b, eps: float = 1e-6):
    """``LayerNorm(x) @ w + b`` with the LN fused into the matmul prologue.

    x: (B, N, E); scale/bias: (E,) LN affine params; w: (E, F); b: (F,).
    Returns (B, N, F) in x.dtype.  LN statistics and the matmul
    accumulator are f32 (matching models/layers.py::LayerNorm).

    Differentiable (round 4): custom VJP with a closed-form XLA backward
    that rematerialises the LN from x — gradient-parity-tested against
    autodiff of the unfused path (tests/test_ln_matmul.py).

    Requires N % row-tile == 0 and E, F multiples of 128 — callers gate
    on ``ln_matmul_supported``.
    """
    return _ln_matmul_custom(x, scale, bias, w, b, eps)


def ln_matmul_supported(x) -> bool:
    """Shape gate for ``ln_matmul`` (last dims must ride full vregs).

    The ``n >= 512`` floor matches the token-major attention gate: below
    it the fusion saves nothing, and it keeps the tiny-shape CPU ``init``
    trace (infer/image.py::init_inference_params, 64-token grid) off the
    Pallas path, which has no CPU lowering.
    """
    bsz, n, e = x.shape
    return e % 128 == 0 and n % 8 == 0 and n >= 512
