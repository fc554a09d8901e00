"""RAFT-large optical flow (torchvision architecture), TPU-native.

The reference computes flow with torchvision ``raft_large``
(``Raft_Large_Weights.C_T_SKHT_V2``) inside the Sintel dataset
(reference datasets.py:98-121) and the Videvo temporal eval
(reference exps_video.py:45-46), using the last of the 12 recurrent
refinements.  This module rebuilds that model TPU-first:

- NHWC flax modules throughout; the twelve recurrent updates run under
  ``nn.scan`` (one traced step, compiler-friendly), not a Python loop.
- The all-pairs correlation volume is one batched einsum on the MXU; the
  4-level pyramid lookup is a vectorised 4-tap gather (no grid_sample op
  on TPU), matching torch ``grid_sample(align_corners=True,
  padding_mode="zeros")`` semantics exactly.
- Convex upsampling is a reshape/softmax/weighted-sum in NHWC.

Weights import from a torchvision ``raft_large`` state_dict via
``import_raft`` (kernels OIHW -> HWIO).  Inputs are (B, H, W, 3) in
[-1, 1] (the reference's ``raftTransforms`` domain, utilities.py:19-26);
H and W must be divisible by 8.  Returns pixel flow (B, H, W, 2), last
dim (dx, dy).
"""

import math
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from .layers import torch_uniform_init
from ..ops.instance_norm import instance_norm

HIDDEN_DIM = 128
CONTEXT_DIM = 128
NUM_LEVELS = 4
RADIUS = 4
UPSAMPLE = 8


class ConvNormAct(nn.Module):
    """Conv2dNormActivation: conv(+bias) -> {none,instance,batch} norm -> ReLU.

    RAFT keeps conv biases even under norm layers (torchvision raft.py keeps
    them to stay loadable from the original weights); InstanceNorm2d is
    affine-free and stat-free, BatchNorm2d runs in eval mode on imported
    running stats (both eps=1e-5, torch defaults).
    """

    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)
    norm: str = "none"
    act: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        c_in = x.shape[-1]
        fan_in = c_in * kh * kw
        w = self.param("kernel", torch_uniform_init(fan_in),
                       (kh, kw, c_in, self.features))
        b = self.param("bias", torch_uniform_init(fan_in), (self.features,))
        y = lax.conv_general_dilated(
            x, w.astype(x.dtype), (self.stride, self.stride),
            [(self.padding[0], self.padding[0]),
             (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype) + b.astype(x.dtype)
        if self.norm == "instance":
            y = instance_norm(y)
        elif self.norm == "batch":
            scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
            bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
            mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
            var = self.param("bn_var", nn.initializers.ones, (self.features,))
            y = (y - mean) * lax.rsqrt(var + 1e-5) * scale + bias
        if self.act:
            y = nn.relu(y)
        return y


class ResidualBlock(nn.Module):
    """Two 3x3 ConvNormActs + projected residual (torchvision raft.py)."""

    features: int
    stride: int = 1
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        y = ConvNormAct(self.features, (3, 3), self.stride, (1, 1),
                        self.norm, name="convnormrelu1")(x)
        y = ConvNormAct(self.features, (3, 3), 1, (1, 1),
                        self.norm, name="convnormrelu2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = ConvNormAct(self.features, (1, 1), self.stride, (0, 0),
                            self.norm, act=False, name="downsample")(x)
        return nn.relu(x + y)


class RAFTEncoder(nn.Module):
    """Feature (instance-norm) / context (batch-norm) encoder, stride 8.

    layers=(64, 64, 96, 128, 256) as in raft_large; output 256 channels.
    """

    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = ConvNormAct(64, (7, 7), 2, (3, 3), self.norm,
                        name="convnormrelu")(x)
        for li, (f, s) in enumerate(((64, 1), (96, 2), (128, 2)), start=1):
            x = ResidualBlock(f, s, self.norm, name=f"layer{li}_0")(x)
            x = ResidualBlock(f, 1, self.norm, name=f"layer{li}_1")(x)
        c_in = x.shape[-1]
        w = self.param("conv_kernel", torch_uniform_init(c_in), (1, 1, c_in, 256))
        b = self.param("conv_bias", torch_uniform_init(c_in), (256,))
        return (jnp.einsum("bhwc,co->bhwo", x, w[0, 0]) + b).astype(x.dtype)


# ------------------------------------------------------- correlation pyramid


def build_corr_pyramid(fmap1, fmap2, num_levels: int = NUM_LEVELS):
    """All-pairs correlation + 2x avg-pooled pyramid.

    fmap1/fmap2: (B, H, W, C).  Returns list of (B, H*W, h_l, w_l), level 0
    at full (H, W).  Matches torchvision CorrBlock.build_pyramid: dot product
    over channels / sqrt(C), pyramid pooled on the *second* image's axes.
    """
    b, h, w, c = fmap1.shape
    corr = jnp.einsum(
        "bnc,bmc->bnm",
        fmap1.reshape(b, h * w, c),
        fmap2.reshape(b, h * w, c),
        preferred_element_type=jnp.float32,
    ) / math.sqrt(c)
    corr = corr.reshape(b, h * w, h, w)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = lax.reduce_window(
            corr, 0.0, lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        ) / 4.0
        pyramid.append(corr)
    return pyramid


def _bilinear_lookup(flat, sx, sy, hl, wl):
    """Bilinear sample of (B, Q, hl*wl) maps at absolute (sx, sy) points.

    sx, sy: (B, Q, K) pixel coordinates.  Zero padding outside [0, size-1]
    per-tap — torch grid_sample(align_corners=True, padding_mode="zeros")
    on an absolute grid normalised by 2x/(S-1)-1 is exactly this.
    """
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx1 = sx - x0
    wy1 = sy - y0

    def tap(yi, xi, wgt):
        valid = (xi >= 0) & (xi <= wl - 1) & (yi >= 0) & (yi <= hl - 1)
        idx = (jnp.clip(yi, 0, hl - 1).astype(jnp.int32) * wl
               + jnp.clip(xi, 0, wl - 1).astype(jnp.int32))
        vals = jnp.take_along_axis(flat, idx, axis=2)
        return vals * (wgt * valid.astype(flat.dtype))

    return (
        tap(y0, x0, (1 - wy1) * (1 - wx1))
        + tap(y0, x0 + 1, (1 - wy1) * wx1)
        + tap(y0 + 1, x0, wy1 * (1 - wx1))
        + tap(y0 + 1, x0 + 1, wy1 * wx1)
    )


def lookup_corr(pyramid, coords, radius: int = RADIUS):
    """Index the pyramid around ``coords`` (B, H, W, 2 absolute (x, y)).

    Returns (B, H, W, num_levels*(2r+1)^2).  Channel order matches
    torchvision index_pyramid: level-major, then the x-offset (outer) by
    y-offset (inner) neighbourhood grid.
    """
    b, h, w, _ = coords.shape
    q = h * w
    side = 2 * radius + 1
    delta = jnp.linspace(-radius, radius, side, dtype=coords.dtype)
    cc = coords.reshape(b, q, 2)
    out = []
    for lvl, corr in enumerate(pyramid):
        hl, wl = corr.shape[2], corr.shape[3]
        c = cc / (2 ** lvl)
        px = c[..., 0:1] + delta  # (B, Q, side) — x offsets (outer axis)
        py = c[..., 1:2] + delta  # (B, Q, side) — y offsets (inner axis)
        sx = jnp.broadcast_to(px[..., :, None], (b, q, side, side))
        sy = jnp.broadcast_to(py[..., None, :], (b, q, side, side))
        vals = _bilinear_lookup(
            corr.reshape(b, q, hl * wl),
            sx.reshape(b, q, side * side),
            sy.reshape(b, q, side * side),
            hl, wl,
        )
        out.append(vals)
    return jnp.concatenate(out, axis=-1).reshape(b, h, w, -1)


# ------------------------------------------------------------- update block


class MotionEncoder(nn.Module):
    """corr_layers=(256, 192), flow_layers=(128, 64), out 128 (126 + flow)."""

    @nn.compact
    def __call__(self, flow, corr):
        c = ConvNormAct(256, (1, 1), name="convcorr1")(corr)
        c = ConvNormAct(192, (3, 3), padding=(1, 1), name="convcorr2")(c)
        f = ConvNormAct(128, (7, 7), padding=(3, 3), name="convflow1")(flow)
        f = ConvNormAct(64, (3, 3), padding=(1, 1), name="convflow2")(f)
        cf = ConvNormAct(126, (3, 3), padding=(1, 1), name="conv")(
            jnp.concatenate([c, f], axis=-1)
        )
        return jnp.concatenate([cf, flow], axis=-1)


class ConvGRU(nn.Module):
    """Separable-kernel conv GRU cell (torchvision raft.py ConvGRU)."""

    kernel: Tuple[int, int]
    padding: Tuple[int, int]

    @nn.compact
    def __call__(self, h, x):
        hidden = h.shape[-1]
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(ConvNormAct(hidden, self.kernel, padding=self.padding,
                                       act=False, name="convz")(hx))
        r = jax.nn.sigmoid(ConvNormAct(hidden, self.kernel, padding=self.padding,
                                       act=False, name="convr")(hx))
        q = jnp.tanh(ConvNormAct(hidden, self.kernel, padding=self.padding,
                                 act=False, name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1.0 - z) * h + z * q


class RecurrentBlock(nn.Module):
    @nn.compact
    def __call__(self, h, x):
        h = ConvGRU((1, 5), (0, 2), name="convgru1")(h, x)
        h = ConvGRU((5, 1), (2, 0), name="convgru2")(h, x)
        return h


class FlowHead(nn.Module):
    @nn.compact
    def __call__(self, h):
        y = nn.relu(ConvNormAct(256, (3, 3), padding=(1, 1), act=False,
                                name="conv1")(h))
        return ConvNormAct(2, (3, 3), padding=(1, 1), act=False, name="conv2")(y)


class UpdateBlock(nn.Module):
    @nn.compact
    def __call__(self, hidden, context, corr, flow):
        motion = MotionEncoder(name="motion_encoder")(flow, corr)
        x = jnp.concatenate([context, motion], axis=-1)
        hidden = RecurrentBlock(name="recurrent_block")(hidden, x)
        delta = FlowHead(name="flow_head")(hidden)
        return hidden, delta


class MaskPredictor(nn.Module):
    @nn.compact
    def __call__(self, h):
        y = ConvNormAct(256, (3, 3), padding=(1, 1), name="convrelu")(h)
        return 0.25 * ConvNormAct(9 * UPSAMPLE * UPSAMPLE, (1, 1), act=False,
                                  name="conv")(y)


def upsample_flow(flow, up_mask):
    """Convex 8x upsampling (torchvision raft.py upsample_flow).

    flow: (B, h, w, 2); up_mask: (B, h, w, 9*64).  The mask channel layout is
    (neighbour, u, v) row-major — identical to the torch (B, 9*64, h, w)
    channel order, so imported weights line up.  Neighbours are the 3x3
    zero-padded window in (dy, dx) row-major order (torch F.unfold).
    """
    b, h, w, _ = flow.shape
    f = UPSAMPLE
    mask = up_mask.reshape(b, h, w, 9, f, f)
    mask = jax.nn.softmax(mask, axis=3)

    fl = jnp.pad(flow * f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack(
        [fl[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)],
        axis=3,
    )  # (B, h, w, 9, 2)

    up = jnp.einsum("bhwnuv,bhwnc->bhwuvc", mask, patches)  # (B, h, w, f, f, 2)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * f, w * f, 2)


class _ScanStep(nn.Module):
    """One recurrent refinement, lifted through nn.scan (params broadcast)."""

    radius: int = RADIUS

    @nn.compact
    def __call__(self, carry, _):
        hidden, coords1, coords0, context, pyramid = carry
        coords1 = lax.stop_gradient(coords1)
        corr = lookup_corr(pyramid, coords1, self.radius)
        flow = coords1 - coords0
        hidden, delta = UpdateBlock(name="update_block")(
            hidden, context, corr, flow)
        coords1 = coords1 + delta
        up_mask = MaskPredictor(name="mask_predictor")(hidden)
        up_flow = upsample_flow(coords1 - coords0, up_mask)
        return (hidden, coords1, coords0, context, pyramid), up_flow


def _coords_grid(b, h, w, dtype):
    gx, gy = jnp.meshgrid(jnp.arange(w, dtype=dtype),
                          jnp.arange(h, dtype=dtype))
    return jnp.broadcast_to(jnp.stack([gx, gy], -1), (b, h, w, 2))


class RAFT(nn.Module):
    """raft_large: returns the per-iteration upsampled flows, last = final.

    __call__(img1, img2): (B, H, W, 3) in [-1, 1], H % 8 == W % 8 == 0.
    Returns (num_iters, B, H, W, 2); consumers use ``[-1]`` (the reference
    uses ``raft(...)[-1]``, datasets.py:118-119).
    """

    num_iters: int = 12
    num_levels: int = NUM_LEVELS
    radius: int = RADIUS

    @nn.compact
    def __call__(self, img1, img2):
        b, h, w, _ = img1.shape
        assert h % UPSAMPLE == 0 and w % UPSAMPLE == 0, (
            f"input size must be divisible by 8, got {(h, w)}")
        fe = RAFTEncoder(norm="instance", name="feature_encoder")
        fmap1 = fe(img1)
        fmap2 = fe(img2)
        pyramid = build_corr_pyramid(fmap1, fmap2, self.num_levels)

        ctx = RAFTEncoder(norm="batch", name="context_encoder")(img1)
        hidden = jnp.tanh(ctx[..., :HIDDEN_DIM])
        context = nn.relu(ctx[..., HIDDEN_DIM:])

        coords0 = _coords_grid(b, h // UPSAMPLE, w // UPSAMPLE, img1.dtype)
        scan = nn.scan(
            _ScanStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=self.num_iters,
        )(radius=self.radius, name="core")
        _, flows = scan((hidden, coords0, coords0, context, pyramid), None)
        return flows


# ------------------------------------------------------------------ import


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _cnr(sd: Dict[str, np.ndarray], prefix: str, norm: str = "none") -> Dict:
    p = {"kernel": _conv_w(sd[f"{prefix}.0.weight"]),
         "bias": sd[f"{prefix}.0.bias"]}
    if norm == "batch":
        p.update(
            bn_scale=sd[f"{prefix}.1.weight"],
            bn_bias=sd[f"{prefix}.1.bias"],
            bn_mean=sd[f"{prefix}.1.running_mean"],
            bn_var=sd[f"{prefix}.1.running_var"],
        )
    return p


def _plain(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    return {"kernel": _conv_w(sd[f"{prefix}.weight"]),
            "bias": sd[f"{prefix}.bias"]}


def _encoder(sd: Dict[str, np.ndarray], name: str, norm: str) -> Dict:
    e: Dict = {
        "convnormrelu": _cnr(sd, f"{name}.convnormrelu", norm),
        "conv_kernel": _conv_w(sd[f"{name}.conv.weight"]),
        "conv_bias": sd[f"{name}.conv.bias"],
    }
    for li in (1, 2, 3):
        for bi in (0, 1):
            t = f"{name}.layer{li}.{bi}"
            blk = {
                "convnormrelu1": _cnr(sd, f"{t}.convnormrelu1", norm),
                "convnormrelu2": _cnr(sd, f"{t}.convnormrelu2", norm),
            }
            if f"{t}.downsample.0.weight" in sd:
                blk["downsample"] = _cnr(sd, f"{t}.downsample", norm)
            e[f"layer{li}_{bi}"] = blk
    return e


def import_raft(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision ``raft_large`` state_dict -> RAFT params.

    Feature encoder is instance-normed (no norm params), context encoder is
    batch-normed (running stats imported); the update block, flow head and
    mask predictor are plain biased convs.
    """
    u = "update_block"
    me = f"{u}.motion_encoder"
    rb = f"{u}.recurrent_block"
    fh = f"{u}.flow_head"
    return {
        "feature_encoder": _encoder(sd, "feature_encoder", "none"),
        "context_encoder": _encoder(sd, "context_encoder", "batch"),
        "core": {
            "update_block": {
                "motion_encoder": {
                    "convcorr1": _cnr(sd, f"{me}.convcorr1"),
                    "convcorr2": _cnr(sd, f"{me}.convcorr2"),
                    "convflow1": _cnr(sd, f"{me}.convflow1"),
                    "convflow2": _cnr(sd, f"{me}.convflow2"),
                    "conv": _cnr(sd, f"{me}.conv"),
                },
                "recurrent_block": {
                    "convgru1": {k: _plain(sd, f"{rb}.convgru1.{k}")
                                 for k in ("convz", "convr", "convq")},
                    "convgru2": {k: _plain(sd, f"{rb}.convgru2.{k}")
                                 for k in ("convz", "convr", "convq")},
                },
                "flow_head": {
                    "conv1": _plain(sd, f"{fh}.conv1"),
                    "conv2": _plain(sd, f"{fh}.conv2"),
                },
            },
            "mask_predictor": {
                "convrelu": _cnr(sd, "mask_predictor.convrelu"),
                "conv": _plain(sd, "mask_predictor.conv"),
            },
        },
    }
