"""ViT feature-pyramid encoders (content & style paths).

Capability parity with reference network/vit.py:45-236: patch embedding,
learned interpolated positional grid (content encoder only), pre-LN encoder
blocks returning *every* block's output as a feature pyramid at H/8 x W/8.

Behavioural note (reference vit.py:48,116): the reference constructs torch
MultiheadAttention without ``batch_first`` yet feeds (B, N, C), so attention
mixes the *image batch* at each spatial position instead of mixing tokens.
Trained reference checkpoints encode that behaviour.  ``attn_mode`` selects:

- ``"spatial"``       idiomatic token attention (default for new training)
- ``"batch_coupled"`` bug-compatible reference behaviour (weight parity)

All tensors NHWC; tokens (B, N, C).
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import LayerNorm, MultiHeadSelfAttention, TorchConv, TorchLinear
from ..ops.resize import resize_bilinear


class PatchEmbedding(nn.Module):
    """Conv with kernel = stride = patch size, flattened to tokens
    (reference vit.py:105-117)."""

    patch_size: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        y = TorchConv(
            self.hidden_dim, self.patch_size, stride=self.patch_size, name="proj"
        )(x)
        b, h, w, c = y.shape
        return y.reshape(b, h * w, c), (h, w)


class PosEmbedding(nn.Module):
    """Learned (32, 32, C) position grid, bilinearly regridded to the token
    grid at forward time (reference vit.py:67-102)."""

    embed_dim: int
    base_size: int = 32

    @nn.compact
    def __call__(self, grid_hw):
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, self.base_size, self.base_size, self.embed_dim),
        )
        h, w = grid_hw
        if (h, w) != (self.base_size, self.base_size):
            pos = resize_bilinear(pos, (h, w))
        return pos.reshape(1, h * w, self.embed_dim)


class ConvFF(nn.Module):
    """Conv feed-forward: 1x1 -> depthwise-separable 3x3 -> 1x1 on the
    re-rasterised token grid (reference vit.py:10-24; unused by reference
    entry scripts, kept for component parity)."""

    mlp_dim: int

    @nn.compact
    def __call__(self, x, hw):
        from .decoder import ConvDepthwiseSeparable
        from .layers import TorchConv

        b, n, c = x.shape
        h, w = hw
        y = x.reshape(b, h, w, c)
        y = TorchConv(self.mlp_dim, 1, name="conv_in")(y)
        y = ConvDepthwiseSeparable(self.mlp_dim, name="conv_dw")(y)
        y = TorchConv(c, 1, name="conv_out")(y)
        return y.reshape(b, n, c)


class EncoderBlockConvFF(nn.Module):
    """Encoder block whose MLP is a ConvFF (reference vit.py:27-42)."""

    num_heads: int
    mlp_dim: int
    attn_mode: str = "spatial"

    @nn.compact
    def __call__(self, x, hw):
        h = LayerNorm(name="ln1")(x)
        attn = MultiHeadSelfAttention(self.num_heads, name="attention")
        if self.attn_mode == "spatial":
            h = attn(h)
        else:
            h = attn(h.transpose(1, 0, 2)).transpose(1, 0, 2)
        x = x + h
        y = LayerNorm(name="ln2")(x)
        y = ConvFF(self.mlp_dim, name="mlp")(y, hw)
        return x + y


class EncoderBlock(nn.Module):
    """Pre-LN transformer block (reference vit.py:45-64)."""

    num_heads: int
    mlp_dim: int
    attn_mode: str = "spatial"
    use_pallas: bool = False
    tokmaj: bool = False  # see MultiHeadSelfAttention.tokmaj
    # fuse each pre-LN into its following matmul (ops/ln_matmul_pallas) —
    # forward-only, TPU inference builds
    fuse_ln: bool = False
    sp_axis: str | None = None  # see MultiHeadSelfAttention.sp_axis

    @nn.compact
    def __call__(self, x):
        # x: (B, N, C)
        from ..ops.ln_matmul_pallas import ln_matmul, ln_matmul_supported

        ln1 = LayerNorm(name="ln1")
        attn = MultiHeadSelfAttention(
            self.num_heads,
            use_pallas=self.use_pallas and self.attn_mode == "spatial",
            tokmaj=self.tokmaj,
            sp_axis=self.sp_axis if self.attn_mode == "spatial" else None,
            name="attention",
        )
        fuse = self.fuse_ln and self.sp_axis is None
        if self.attn_mode == "spatial":
            if fuse:
                h = attn(x, ln=ln1(x, return_params=True))
            else:
                h = attn(ln1(x))
        elif self.attn_mode == "batch_coupled":
            # Reference quirk: sequence axis = image batch. Treat tokens as
            # the batch and the image batch as the sequence.
            h = attn(ln1(x).transpose(1, 0, 2)).transpose(1, 0, 2)
        else:
            raise ValueError(f"unknown attn_mode: {self.attn_mode}")
        x = x + h
        ln2 = LayerNorm(name="ln2")
        fc1 = TorchLinear(self.mlp_dim, name="mlp_fc1")
        if fuse and ln_matmul_supported(x):
            s2, b2 = ln2(x, return_params=True)
            wk, wb = fc1(x, return_params=True)
            y = ln_matmul(x, s2, b2, wk, wb)
        else:
            y = fc1(ln2(x))
        y = nn.relu(y)
        y = TorchLinear(x.shape[-1], name="mlp_fc2")(y)
        return x + y


class VisionTransformer(nn.Module):
    """The trained encoder (reference vit.py:120-169).

    Returns the output of every encoder block reshaped to (B, H/p, W/p, C).
    """

    patch_size: int = 8
    num_layers: int = 3
    num_heads: int = 8
    hidden_dim: int = 512
    mlp_dim: int = 2048
    pos_embedding: bool = True
    attn_mode: str = "spatial"
    use_pallas: bool = False
    tokmaj: bool = False  # see MultiHeadSelfAttention.tokmaj
    fuse_ln: bool = False  # see EncoderBlock.fuse_ln (forward-only)
    # sequence parallelism (parallel/sp.py): the input rows — hence the
    # token grid's row axis — are sharded over this mesh axis inside
    # shard_map; attention all-gathers K/V, everything else is local.
    sp_axis: str | None = None

    @nn.compact
    def __call__(self, x):
        tokens, (h, w) = PatchEmbedding(
            self.patch_size, self.hidden_dim, name="patch_embedding"
        )(x)
        if self.pos_embedding:
            pos = PosEmbedding(self.hidden_dim, name="pos_embedding")
            if self.sp_axis is None:
                tokens = tokens + pos((h, w)).astype(tokens.dtype)
            else:
                # local rows are a slice of the GLOBAL position grid:
                # regrid at the global size, slice this shard's rows
                n_sh = jax.lax.psum(1, self.sp_axis)
                idx = jax.lax.axis_index(self.sp_axis)
                pg = pos((h * n_sh, w)).reshape(1, h * n_sh, w,
                                                self.hidden_dim)
                pl = jax.lax.dynamic_slice_in_dim(pg, idx * h, h, axis=1)
                tokens = tokens + pl.reshape(1, h * w, self.hidden_dim) \
                    .astype(tokens.dtype)
        feats = []
        for i in range(self.num_layers):
            tokens = EncoderBlock(
                self.num_heads,
                self.mlp_dim,
                attn_mode=self.attn_mode,
                use_pallas=self.use_pallas,
                tokmaj=self.tokmaj,
                fuse_ln=self.fuse_ln,
                sp_axis=self.sp_axis,
                name=f"block{i}",
            )(tokens)
            feats.append(tokens.reshape(-1, h, w, self.hidden_dim))
        return feats


class VisionTransformerMultiScale(nn.Module):
    """Pyramid variant with stride-2 re-patching between stages
    (reference vit.py:172-236; exported but unused by reference entry scripts —
    kept for component parity)."""

    patch_size: int = 4
    num_layers: int = 3
    num_heads: int = 8
    hidden_dims: Sequence[int] = (256, 512, 512)
    mlp_dims: Sequence[int] = (1024, 2048, 2048)
    pos_embedding: bool = True
    attn_mode: str = "spatial"

    @nn.compact
    def __call__(self, x):
        tokens, (h, w) = PatchEmbedding(
            self.patch_size, self.hidden_dims[0], name="patch_embedding"
        )(x)
        if self.pos_embedding:
            tokens = tokens + PosEmbedding(
                self.hidden_dims[0], name="pos_embedding"
            )((h, w)).astype(tokens.dtype)
        feats = []
        for i in range(self.num_layers):
            tokens = EncoderBlock(
                self.num_heads,
                self.mlp_dims[i],
                attn_mode=self.attn_mode,
                name=f"block{i}",
            )(tokens)
            y = tokens.reshape(-1, h, w, self.hidden_dims[i])
            feats.append(y)
            if i < self.num_layers - 1:
                tokens, (h, w) = PatchEmbedding(
                    2, self.hidden_dims[i + 1], name=f"repatch{i}"
                )(y)
        return feats
