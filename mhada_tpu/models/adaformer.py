"""AdaFormer: the multi-head adaptive-attention decoder-transformer.

Capability parity with reference network/adaDecoder.py:

- ``AdaAttnMultiHead``   learnable multi-head AdaAttN (adaDecoder.py:134-206)
- ``AdaFormer``          2*num_layers MHAda blocks + Decoder (adaDecoder.py:235-268)
- ``AdaAttnSingle``      single-head learnable variant (adaDecoder.py:85-131)
- ``AdaAttnTransformer`` single-head stack (adaDecoder.py:209-232)
- ``adaattn_for_loss``   parameter-free AdaAttN used in the loss (adaDecoder.py:38-81)

TPU-first: the reference's Python loop over per-head ModuleLists becomes one
batched einsum over a (heads, d, d) kernel stack; instance norm commutes with
the contiguous head split so it is applied once over the full channel dim.
Spatial maps are NHWC; attention operates on (B, N, C) tokens.
"""

import os
from typing import List, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .layers import torch_uniform_init
from .decoder import Decoder
from ..ops.instance_norm import instance_norm_tokens
from ..ops.mhada import mhada_attention, adaattn_single


def _to_tokens(x: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c), (h, w)


class AdaAttnMultiHead(nn.Module):
    """Multi-head adaptive attention over token features.

    fc, fcs: (B, N, C) queries / current stylised features;
    fs: (B, M, C) style features.  Heads split the channel dim contiguously
    (reference adaDecoder.py:168-170).
    """

    num_heads: int = 8
    activation: str = "softmax"
    use_pallas: bool = False
    # fuse the per-head IN + Q projection into the Pallas kernel prologue
    # (inference-only: the fused op has no VJP; see ops/mhada_pallas.py)
    fuse_prologue: bool = False
    # sequence parallelism: content/stylised tokens sharded over this mesh
    # axis inside shard_map — their instance-norm statistics reduce
    # globally; style K/V are replicated so attention itself is local
    # (parallel/sp.py)
    sp_axis: str | None = None

    @nn.compact
    def __call__(self, fc, fs, fcs, style_kv=None):
        """``style_kv``: optional precomputed ((B,M,C), (B,M,C)) token-major
        keys/values — they depend only on the style, so streaming callers
        compute them once per style (see infer.image.precompute_style_kv)."""
        C = fc.shape[-1]
        H = self.num_heads
        d = C // H

        def headed_proj(name):
            kernel = self.param(
                f"{name}_kernel", torch_uniform_init(d), (H, d, d)
            )
            bias = self.param(f"{name}_bias", torch_uniform_init(d), (H, d))
            return kernel, bias

        fk, fb = headed_proj("f")
        gk, gb = headed_proj("g")
        hk, hb = headed_proj("h")

        out_kernel = self.param("out_kernel", torch_uniform_init(C), (C, C))
        out_bias = self.param("out_bias", torch_uniform_init(C), (C,))
        dt = fc.dtype

        # the fused-prologue kernel is single-pass (keys VMEM-resident):
        # beyond M=4096 fall through to the streaming unfused path
        if (self.fuse_prologue and self.use_pallas and style_kv is not None
                and self.activation == "softmax" and self.sp_axis is None
                and style_kv[0].shape[1] <= 4096):
            from ..ops.mhada_pallas import mhada_fused_prologue

            def in_stats(tok):
                tf = tok.astype(jnp.float32)
                mean = jnp.mean(tf, axis=1)
                var = jnp.mean(jnp.square(tf - mean[:, None]), axis=1)
                return mean, jnp.reciprocal(jnp.sqrt(var + 1e-5))

            mc, rc = in_stats(fc)
            ms, rs = in_stats(fcs)
            stats = jnp.stack([mc, rc, ms, rs], axis=1)  # (B, 4, C)
            k, v = style_kv
            out = mhada_fused_prologue(
                fc, fcs, stats, fk.astype(dt), fb.astype(dt), k, v)
            return out @ out_kernel.astype(dt) + out_bias.astype(dt)

        qn = instance_norm_tokens(fc, axis_name=self.sp_axis)
        fcs_n = instance_norm_tokens(fcs, axis_name=self.sp_axis)

        B, N, _ = fc.shape
        dt = fc.dtype
        q = jnp.einsum(
            "bnhd,hde->bnhe", qn.reshape(B, N, H, d), fk.astype(dt)
        ) + fb.astype(dt)

        if style_kv is None:
            M = fs.shape[1]
            kn = instance_norm_tokens(fs)
            k_tok = jnp.einsum(
                "bmhd,hde->bmhe", kn.reshape(B, M, H, d), gk.astype(dt)
            ).reshape(B, M, C) + gb.reshape(C).astype(dt)
            v_tok = jnp.einsum(
                "bmhd,hde->bmhe", fs.reshape(B, M, H, d), hk.astype(dt)
            ).reshape(B, M, C) + hb.reshape(C).astype(dt)
        else:
            k_tok, v_tok = style_kv  # token-major (B, M, C)
            M = k_tok.shape[1]

        if (self.use_pallas and self.activation == "softmax"
                and self.sp_axis is None and d == 64 and C % 128 == 0
                and M <= 2048
                and os.environ.get("MHADA_TM_TRAIN", "1") != "0"):
            # differentiable token-major kernel: q/k/v/fcs_n stay (B, *, C)
            # — the 5 head-split transposes per block (and their autodiff
            # mirrors) never exist (ops/mhada_pallas.py::mhada_tm_train)
            from ..ops.mhada_pallas import mhada_tm_train

            out = mhada_tm_train(q.reshape(B, N, C), k_tok, v_tok, fcs_n, H)
            return out @ out_kernel.astype(dt) + out_bias.astype(dt)

        out = mhada_attention(
            q.transpose(0, 2, 1, 3),
            k_tok.reshape(B, M, H, d).transpose(0, 2, 1, 3),
            v_tok.reshape(B, M, H, d).transpose(0, 2, 1, 3),
            fcs_n.reshape(B, N, H, d).transpose(0, 2, 1, 3),
            activation=self.activation,
            use_pallas=self.use_pallas,
        )  # (B, H, N, d)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return out @ out_kernel.astype(dt) + out_bias.astype(dt)


class AdaAttnSingle(nn.Module):
    """Single-head learnable AdaAttN (reference adaDecoder.py:85-131)."""

    activation: str = "softmax"

    @nn.compact
    def __call__(self, fc, fs, fcs):
        C = fc.shape[-1]

        def proj(name):
            kernel = self.param(f"{name}_kernel", torch_uniform_init(C), (C, C))
            bias = self.param(f"{name}_bias", torch_uniform_init(C), (C,))
            return kernel, bias

        fk, fb = proj("f")
        gk, gb = proj("g")
        hk, hb = proj("h")
        dt = fc.dtype
        q = instance_norm_tokens(fc) @ fk.astype(dt) + fb.astype(dt)
        k = instance_norm_tokens(fs) @ gk.astype(dt) + gb.astype(dt)
        v = fs @ hk.astype(dt) + hb.astype(dt)
        fcs_n = instance_norm_tokens(fcs)
        out = mhada_attention(
            q[:, None], k[:, None], v[:, None], fcs_n[:, None],
            activation=self.activation,
        )
        return out[:, 0]


class AdaFormer(nn.Module):
    """The trained decoder-transformer (reference AdaAttnTransformerMultiHead).

    Per layer i applies two MHAda blocks: content-as-query then self-as-query
    (reference adaDecoder.py:262-265), then decodes.  Returns (fcs_map, cs).
    """

    num_layers: int = 3
    num_heads: int = 8
    activation: str = "softmax"
    use_pallas: bool = False
    packed_decoder: bool | str = False  # False | True/"2x2" | "col"
    fuse_prologue: bool = False  # see AdaAttnMultiHead.fuse_prologue

    @nn.compact
    def __call__(
        self,
        fc: List[jnp.ndarray],
        fs: List[jnp.ndarray],
        style_kv: List = None,
    ):
        """``style_kv``: optional list of 2*num_layers (k, v) tuples from
        ``infer.image.precompute_style_kv`` (style-only work hoisted out of
        the per-frame streaming path); ``fs`` may then be None."""
        fc_tok = []
        fs_tok = []
        hw = None
        for f in fc:
            t, hw = _to_tokens(f)
            fc_tok.append(t)
        if style_kv is None:
            for f in fs:
                t, _ = _to_tokens(f)
                fs_tok.append(t)
        else:
            fs_tok = [None] * self.num_layers

        fcs = fc_tok[0]
        for i in range(self.num_layers):
            fcs = AdaAttnMultiHead(
                self.num_heads, self.activation, self.use_pallas,
                self.fuse_prologue, name=f"ada{2 * i}",
            )(fc_tok[i], fs_tok[i], fcs,
              style_kv[2 * i] if style_kv else None)
            fcs = AdaAttnMultiHead(
                self.num_heads, self.activation, self.use_pallas,
                self.fuse_prologue, name=f"ada{2 * i + 1}",
            )(fcs, fs_tok[i], fcs,
              style_kv[2 * i + 1] if style_kv else None)

        b, n, c = fcs.shape
        fcs_map = fcs.reshape(b, hw[0], hw[1], c)
        cs = Decoder(packed=self.packed_decoder, name="decoder")(fcs_map)
        return fcs_map, cs


class AdaAttnTransformer(nn.Module):
    """Single-head stack variant (reference adaDecoder.py:209-232); returns cs
    only.  Exported-but-unused in the reference; kept for component parity."""

    num_layers: int = 3
    activation: str = "softmax"

    @nn.compact
    def __call__(self, fc: List[jnp.ndarray], fs: List[jnp.ndarray]):
        fc_tok = []
        fs_tok = []
        hw = None
        for f in fc:
            t, hw = _to_tokens(f)
            fc_tok.append(t)
        for f in fs:
            t, _ = _to_tokens(f)
            fs_tok.append(t)
        fcs = fc_tok[0]
        for i in range(self.num_layers):
            fcs = AdaAttnSingle(self.activation, name=f"ada{i}")(
                fc_tok[i], fs_tok[i], fcs
            )
        b, n, c = fcs.shape
        return Decoder(name="decoder")(fcs.reshape(b, hw[0], hw[1], c))


def adaattn_for_loss(c_x, s_x, c_1x, s_1x, activation: str = "softmax"):
    """Parameter-free AdaAttN on NHWC maps (reference adaDecoder.py:38-81).

    c_x/s_x: (B, H, W, Cv); c_1x/s_1x: (B, H, W, Cqk) multi-scale concats.
    """
    cx_t, hw = _to_tokens(c_x)
    sx_t, _ = _to_tokens(s_x)
    c1_t, _ = _to_tokens(c_1x)
    s1_t, _ = _to_tokens(s_1x)
    out = adaattn_single(cx_t, sx_t, c1_t, s1_t, activation)
    b, n, c = out.shape
    return out.reshape(b, hw[0], hw[1], c)
