"""Mirrored upsampling decoder (reference network/conv.py:75-100).

512->256 (+2x) -> 3x(256->256) -> 256->128 (+2x) -> 128->128 -> 128->64 (+2x)
-> 64->64 -> 64->3, all reflection-padded 3x3 convs with ReLU.  Note the final
layer is conv+ReLU (NOT tanh — reference conv.py:93): outputs live in
[0, inf) in 0-255 pixel space and consumers clamp to [0, 255].
"""

import flax.linen as nn
import jax.numpy as jnp

from .layers import TorchConv, torch_uniform_init
from ..ops.pad_conv import reflect_pad2d
from ..ops.resize import upsample2x


class _ConvParams(nn.Module):
    """Parameter container with TorchConv's exact tree (kernel HWIO + bias)
    for paths that consume raw weights (the packed decoder stage)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, c_in: int):
        k = self.kernel_size
        fan_in = c_in * k * k
        kernel = self.param(
            "kernel", torch_uniform_init(fan_in), (k, k, c_in, self.features)
        )
        bias = self.param("bias", torch_uniform_init(fan_in), (self.features,))
        return kernel, bias


class ConvDepthwiseSeparable(nn.Module):
    """Reflection-padded depthwise 3x3 + pointwise 1x1 (reference
    conv.py:8-20; used by the ConvFF ViT variant)."""

    features: int
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        from .layers import torch_uniform_init
        from ..ops.pad_conv import conv2d
        import jax.numpy as jnp
        from jax import lax

        c_in = x.shape[-1]
        k = self.kernel_size
        x = reflect_pad2d(x, k // 2)
        dw_kernel = self.param(
            "dw_kernel", torch_uniform_init(k * k), (k, k, 1, c_in)
        )
        dw_bias = self.param("dw_bias", torch_uniform_init(k * k), (c_in,))
        x = lax.conv_general_dilated(
            x, dw_kernel.astype(x.dtype), (self.stride, self.stride),
            [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c_in,
        ) + dw_bias.astype(x.dtype)
        return TorchConv(self.features, 1, name="pointwise")(x)


class ConvTanh(nn.Module):
    """Conv + tanh rescaled to 0-255 (reference conv.py:48-58; unused by the
    reference Decoder, kept for component parity)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        import jax.numpy as jnp

        x = reflect_pad2d(x, self.kernel_size // 2)
        x = TorchConv(self.features, self.kernel_size, name="conv")(x)
        return (jnp.tanh(x) + 1.0) / 2.0 * 255.0


class ConvReLU(nn.Module):
    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        x = reflect_pad2d(x, self.kernel_size // 2)
        x = TorchConv(self.features, self.kernel_size, name="conv")(x)
        return nn.relu(x)


class ConvReluUp(nn.Module):
    """Conv + ReLU + 2x bilinear upsample (reference ConvReluInterpolate)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        x = reflect_pad2d(x, self.kernel_size // 2)
        x = TorchConv(self.features, self.kernel_size, name="conv")(x)
        x = nn.relu(x)
        return upsample2x(x)


class ConvReluUpPacked(nn.Module):
    """ConvReluUp emitting the 2x upsample in packed (space-to-depth) form:
    2x2 subpixels (``mode="2x2"``) or column-only (``mode="col"``).
    Param tree identical to ConvReluUp."""

    features: int
    kernel_size: int = 3
    mode: str = "2x2"

    @nn.compact
    def __call__(self, x):
        from ..ops.pad_conv import conv2d
        from ..ops.packed import upsample2x_packed
        from ..ops.colpacked import (
            col_to_space,
            colpacked_conv_relu,
            space_to_col,
            upsample2x_colpacked,
        )

        k, b = _ConvParams(self.features, self.kernel_size, name="conv")(
            x.shape[-1]
        )
        if self.mode == "col":
            # Run the conv itself column-packed: C_out=64 at 256^2 runs the
            # XLA conv at ~6.6 TF/s (half-empty output lanes); packed to
            # 128 output channels it is MXU-shaped (scripts/decoder_probe).
            xp = colpacked_conv_relu(
                space_to_col(x), k.astype(x.dtype), b.astype(x.dtype))
            return upsample2x_colpacked(col_to_space(xp))
        x = reflect_pad2d(x, self.kernel_size // 2)
        x = nn.relu(conv2d(x, k.astype(x.dtype), b.astype(x.dtype)))
        return upsample2x_packed(x)


class PackedConvReLU(nn.Module):
    """ConvReLU on a packed tensor (exact). Param tree identical to ConvReLU."""

    features: int
    mode: str = "2x2"

    @nn.compact
    def __call__(self, xp):
        from ..ops.packed import packed_conv_relu
        from ..ops.colpacked import colpacked_conv_relu

        if self.mode == "col":
            # col-packed tensors are (B, H, J, 2C)
            k, b = _ConvParams(self.features, name="conv")(xp.shape[-1] // 2)
            return colpacked_conv_relu(xp, k, b)
        k, b = _ConvParams(self.features, name="conv")(xp.shape[-1])
        return packed_conv_relu(xp, k, b)


class _ConvHolder(nn.Module):
    """Parameter-only stand-in for a ConvReLU stage: identical param tree
    (<name>/conv/{kernel, bias}) for paths that consume raw weights."""

    features: int

    @nn.compact
    def __call__(self, c_in: int):
        return _ConvParams(self.features, name="conv")(c_in)


class Decoder(nn.Module):
    """``packed`` executes the final (highest-resolution) stage in
    space-to-depth packed form — element-exact, better MXU utilisation for
    the C=64 convs (see ops/packed.py, ops/colpacked.py, PERF.md):

    - ``False``: plain unpacked convs;
    - ``True`` / ``"2x2"``: 2x2 subpixel packing (4C channels, 4x redundant
      FLOPs);
    - ``"col"``: column-only packing (2C = 128 channels = MXU width, 2x
      redundant FLOPs — half the work of "2x2" at the same utilisation);
    - ``"col_tail"``: column packing with the final conv run as the
      transposed-stacked Pallas kernel (ops/decoder_tail_pallas.py) —
      TPU-only, forward-only (inference builds);
    - ``"mega"``: the ENTIRE tail (up3 conv + 2x bilinear upsample + c5 +
      c6) as one fused Pallas kernel (ops/decoder_tail_pallas.py::
      tail3_fused) — one HBM read of the c4 activation, one write of the
      RGB output.  TPU-only, forward-only (inference builds);
    - ``"mega_train"``: the differentiable megakernel (tail3_train):
      fused forward emitting the VJP residuals, hand-derived XLA col
      backward — the TPU training default (grad parity pinned in
      tests/test_decoder_tail.py).

    The param tree is identical in all modes.

    ``mega_min_grid``: "mega" falls back to the XLA col path when the
    megakernel's grid (B * H/th steps) is smaller than this — below ~64
    steps its serialized manual-DMA pipeline never fills and it loses to
    col (B=1 512^2: mega ~9.4 vs col ~8.9 ms in-graph; 15.5 vs 13.0
    sync-per-frame — scripts/tpu_probe.py --batch 1, round 5).  B is a
    static trace dimension, so the route is decided at trace time.  Set 0
    to force the kernel (parity gates/tests)."""

    packed: bool | str = False
    mega_min_grid: int = 64

    @nn.compact
    def __call__(self, fcs):
        x = ConvReluUp(256, name="up1")(fcs)
        x = ConvReLU(256, name="c1")(x)
        x = ConvReLU(256, name="c2")(x)
        x = ConvReLU(256, name="c3")(x)
        x = ConvReluUp(128, name="up2")(x)
        x = ConvReLU(128, name="c4")(x)
        if not self.packed:
            x = ConvReluUp(64, name="up3")(x)
            x = ConvReLU(64, name="c5")(x)
            return ConvReLU(3, name="c6")(x)

        if isinstance(self.packed, str) and self.packed.startswith("mega"):
            rt = 8 if self.packed in ("mega", "mega_train") \
                else int(self.packed[4:])
            # Small-grid fallback — see the class docstring (mega_min_grid);
            # th mirrors tail3_fused's VMEM-budget row-tile shrink.
            b, hin, win = x.shape[0], x.shape[1], x.shape[2]
            row_bytes = win * jnp.dtype(x.dtype).itemsize
            th = rt if row_bytes <= 512 else max(2, rt * 512 // row_bytes)
            while hin % th:
                th -= 1
            if (self.packed != "mega_train"
                    and b * (hin // th) >= self.mega_min_grid):
                from ..ops.decoder_tail_pallas import tail3_fused

                ku, bu = _ConvHolder(64, name="up3")(x.shape[-1])
                k5, b5 = _ConvHolder(64, name="c5")(64)
                k6, b6 = _ConvHolder(3, name="c6")(64)
                return tail3_fused(x, ku.astype(x.dtype), bu,
                                   k5.astype(x.dtype), b5,
                                   k6.astype(x.dtype), b6, row_tile=rt)
            if self.packed == "mega_train":
                from ..ops.decoder_tail_pallas import tail3_train

                ku, bu = _ConvHolder(64, name="up3")(x.shape[-1])
                k5, b5 = _ConvHolder(64, name="c5")(64)
                k6, b6 = _ConvHolder(3, name="c6")(64)
                return tail3_train(x, ku.astype(x.dtype), bu,
                                   k5.astype(x.dtype), b5,
                                   k6.astype(x.dtype), b6)
            # fall through to the col path (identical param tree)
            self_packed_col = True
        else:
            self_packed_col = False

        mode = ("col" if self_packed_col
                else "2x2" if self.packed in (True, "2x2") else "col")
        xp = ConvReluUpPacked(64, mode=mode, name="up3")(x)
        if self.packed == "col_tail":
            from ..ops.decoder_tail_pallas import c6_transposed

            xp = PackedConvReLU(64, mode="col", name="c5")(xp)
            k6, b6 = _ConvHolder(3, name="c6")(64)
            return c6_transposed(xp, k6, b6)
        xp = PackedConvReLU(64, mode=mode, name="c5")(xp)
        xp = PackedConvReLU(3, mode=mode, name="c6")(xp)
        if mode == "col":
            from ..ops.colpacked import col_to_space

            return col_to_space(xp)
        from ..ops.packed import depth_to_space

        return depth_to_space(xp)
