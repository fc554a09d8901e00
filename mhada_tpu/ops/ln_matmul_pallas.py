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


def ln_matmul(x, scale, bias, w, b, eps: float = 1e-6):
    """``LayerNorm(x) @ w + b`` with the LN fused into the matmul prologue.

    x: (B, N, E); scale/bias: (E,) LN affine params; w: (E, F); b: (F,).
    Returns (B, N, F) in x.dtype.  LN statistics and the matmul
    accumulator are f32 (matching models/layers.py::LayerNorm).

    Requires N % row-tile == 0 and E, F multiples of 128 — callers gate
    on ``ln_matmul_supported``.
    """
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


def ln_matmul_supported(x) -> bool:
    """Shape gate for ``ln_matmul`` (last dims must ride full vregs).

    The ``n >= 512`` floor matches the token-major attention gate: below
    it the fusion saves nothing, and it keeps the tiny-shape CPU ``init``
    trace (infer/image.py::init_inference_params, 64-token grid) off the
    Pallas path, which has no CPU lowering.
    """
    bsz, n, e = x.shape
    return e % 128 == 0 and n % 8 == 0 and n >= 512
