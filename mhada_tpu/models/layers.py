"""Shared layers with PyTorch-default initialisation.

Initialisers reproduce torch defaults so from-scratch training matches the
reference recipe's dynamics: Conv2d/Linear use kaiming-uniform(a=sqrt(5)) which
reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias;
MultiheadAttention packs qkv with xavier-uniform and zero biases
(reference relies on torch 2.5.1 defaults throughout).
"""

import math
import os
from typing import Callable

import jax
import jax.numpy as jnp
import flax.linen as nn


def torch_uniform_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_packed_qkv(embed_dim: int) -> Callable:
    """Xavier-uniform over the torch (3E, E) packed matrix, stored as (E, 3E)."""
    bound = math.sqrt(6.0 / (3 * embed_dim + embed_dim))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """Dense layer with torch Linear init; kernel stored (in, out).

    ``return_params=True`` materialises the parameters and hands them back
    without computing (``x`` supplies only the input width) — used by
    fused-kernel paths that consume the raw weights (ops/ln_matmul_pallas).
    """

    features: int
    use_bias: bool = True
    zero_bias: bool = False

    @nn.compact
    def __call__(self, x, return_params=False):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_uniform_init(fan_in), (fan_in, self.features)
        )
        if self.use_bias:
            if self.zero_bias:
                bias = self.param("bias", nn.initializers.zeros, (self.features,))
            else:
                bias = self.param(
                    "bias", torch_uniform_init(fan_in), (self.features,)
                )
        else:
            bias = None
        if return_params:
            return kernel, bias
        y = x @ kernel.astype(x.dtype)
        if bias is not None:
            y = y + bias.astype(x.dtype)
        return y


class TorchConv(nn.Module):
    """NHWC conv with torch Conv2d init; kernel stored HWIO."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        c_in = x.shape[-1]
        fan_in = c_in * k * k
        kernel = self.param(
            "kernel", torch_uniform_init(fan_in), (k, k, c_in, self.features)
        )
        bias = self.param("bias", torch_uniform_init(fan_in), (self.features,))
        from ..ops.pad_conv import conv2d

        return conv2d(
            x, kernel.astype(x.dtype), bias.astype(x.dtype),
            stride=self.stride, padding=self.padding,
        )


class LayerNorm(nn.Module):
    """LayerNorm over the last axis, torch affine defaults (ones/zeros).

    ``return_params=True`` materialises scale/bias and hands them back
    without computing — used by fused-kernel paths (ops/ln_matmul_pallas).
    """

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, return_params=False):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        if return_params:
            return scale, bias
        return layer_norm_fn(x, scale, bias, self.eps)


def layer_norm_fn(x, scale, bias, eps: float = 1e-6):
    """The LayerNorm math (f32 statistics), shared by the module and the
    fused-path fallbacks."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


class MultiHeadSelfAttention(nn.Module):
    """torch ``nn.MultiheadAttention``-compatible self-attention.

    Input (B, L, E) attends over axis 1 (the sequence axis).  The reference
    feeds (batch, tokens, C) to a seq-first torch MHA (reference vit.py:48,59
    without ``batch_first``), so there the *image batch* is the sequence; the
    caller selects which axis is the sequence by transposing — see
    ``EncoderBlock.attn_mode``.
    """

    num_heads: int
    use_pallas: bool = False
    # token-major kernel (2 heads per 128-lane program, zero head-split
    # transposes) — forward-only, inference builds (ops/attention_pallas.py)
    tokmaj: bool = False
    # sequence parallelism: inside shard_map with the token axis sharded
    # over this mesh axis, keys/values are all-gathered so every shard's
    # local queries attend over the full sequence (parallel/sp.py)
    sp_axis: str | None = None

    @nn.compact
    def __call__(self, x, ln=None):
        # ln: optional (scale, bias) of the caller's pre-LN — fuses the
        # LayerNorm into the qkv projection (ops/ln_matmul_pallas,
        # forward-only); x is then the UN-normalised residual stream.
        B, L, E = x.shape
        hd = E // self.num_heads
        qkv_kernel = self.param(
            "qkv_kernel", xavier_uniform_packed_qkv(E), (E, 3 * E)
        )
        qkv_bias = self.param("qkv_bias", nn.initializers.zeros, (3 * E,))
        if ln is not None:
            from ..ops.ln_matmul_pallas import ln_matmul, ln_matmul_supported

            if ln_matmul_supported(x):
                qkv = ln_matmul(x, ln[0], ln[1], qkv_kernel, qkv_bias)
            else:
                h = layer_norm_fn(x, ln[0], ln[1])
                qkv = (h @ qkv_kernel.astype(h.dtype)
                       + qkv_bias.astype(h.dtype))
        else:
            qkv = x @ qkv_kernel.astype(x.dtype) + qkv_bias.astype(x.dtype)
        # token-major kernels: single-pass (keys VMEM-resident) up to
        # L=4096, the wide transposed streaming kernel beyond (full-width
        # P@V — see ops/attention_pallas.py::attention_stream_wide)
        if (self.tokmaj and self.use_pallas and self.sp_axis is None
                and L >= 512 and hd == 64 and E % 128 == 0):
            if L <= 4096:
                from ..ops.attention_pallas import attention_pallas_tm

                o = attention_pallas_tm(
                    qkv, scale=1.0 / math.sqrt(hd),
                    num_heads=self.num_heads)
            else:
                from ..ops.attention_pallas import attention_stream_wide

                o = attention_stream_wide(
                    qkv, scale=1.0 / math.sqrt(hd),
                    num_heads=self.num_heads)
            return TorchLinear(E, zero_bias=True, name="out_proj")(o)
        # differentiable token-major kernel (training builds): channel-
        # sliced head pairs of the packed qkv, token-major combined
        # backward — no head-split transposes in XLA, forward or backward
        # (~0.3-0.6 ms glue per site at the recipe shape, glue_probe.py).
        # Single-pass keys: L <= 2048 (training token counts); the
        # MHADA_TM_TRAIN=0 env hook restores the head-major VJP (A/B).
        if (self.use_pallas and self.sp_axis is None and 512 <= L <= 2048
                and hd == 64 and E % 128 == 0
                and os.environ.get("MHADA_TM_TRAIN", "1") != "0"):
            from ..ops.attention_pallas import attention_tm_train

            o = attention_tm_train(qkv, 1.0 / math.sqrt(hd), self.num_heads)
            return TorchLinear(E, zero_bias=True, name="out_proj")(o)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, self.num_heads, hd).transpose(0, 2, 1, 3)
        if self.sp_axis is not None:
            # local queries x full keys/values — the K/V all-gather rides
            # ICI; the (N_loc, N_glob) score tile stays shard-local
            k = jax.lax.all_gather(k, self.sp_axis, axis=2, tiled=True)
            v = jax.lax.all_gather(v, self.sp_axis, axis=2, tiled=True)
        if self.use_pallas and L >= 512:
            # fused VMEM kernel: at long sequences XLA materialises the
            # (H, L, L) logits in HBM (ops/attention_pallas.py).
            from ..ops.attention_pallas import attention_pallas

            o = attention_pallas(q, k, v, scale=1.0 / math.sqrt(hd))
        else:
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / math.sqrt(hd)
            a = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, L, E)
        return TorchLinear(E, zero_bias=True, name="out_proj")(o)
