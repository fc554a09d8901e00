"""Central configuration (replaces the reference's per-script UPPER_CASE
constants duplicated across ~15 files — SURVEY.md §5 'Config / flag system').

Defaults reproduce the reference recipes exactly:
image training (train_image.py:14-28) and video training (train_video.py:14-32).
"""

from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class ModelConfig:
    num_layers: int = 3
    num_heads: int = 8
    hidden_dim: int = 512
    mlp_dim: int = 2048
    patch_size: int = 8
    activation: str = "softmax"
    # "spatial" = idiomatic token attention; "batch_coupled" = reference
    # bug-compatible mode (vit.py:48 quirk) for imported checkpoints.
    attn_mode: str = "spatial"
    # MHAda backend: "auto" = fused Pallas kernel on TPU inference, naive
    # einsum elsewhere; "naive" / "pallas" force.
    mhada_backend: str = "auto"
    # fused LN+matmul prologue (ops/ln_matmul_pallas, differentiable since
    # round 4): "auto" = TPU inference builds only; True/False force
    # both/neither build kind (the A/B knob for training, PERF.md).
    fuse_ln: str | bool = "auto"
    # decoder mode for TRAINING builds (inference always uses "mega"):
    # "auto" = the differentiable megakernel tail ("mega_train",
    # ops/decoder_tail_pallas.py::tail3_train) on TPU; "col" forces the
    # round-3/4 XLA col-packed path (the A/B knob, PERF.md round-5).
    train_decoder: str = "auto"


@dataclass(frozen=True)
class ImageTrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    epoch_start: int = 1
    epoch_end: int = 20
    batch_size: int = 8
    lr: float = 1e-4
    lambda_gs: float = 70.0
    lambda_lf: float = 15.0
    lambda_id1: float = 5e-2
    lambda_id2: float = 1e-1
    image_size: Tuple[int, int] = (256, 256)
    # rematerialise the encoder/AdaFormer/VGG forwards in the backward pass
    # (trades FLOPs for activation memory at large batch/resolution)
    remat: bool = False
    # mixed precision: forward/backward in this dtype, master params and
    # Adam state stay float32 ("float32" | "bfloat16")
    compute_dtype: str = "float32"
    # batch the step's repeated sweeps (4 ViT applies -> 2, 3 AdaFormer
    # applies -> 1, 5 VGG sweeps -> 1) along the batch axis.  Only exact
    # when every op is per-sample — i.e. attn_mode="spatial" (the
    # batch_coupled reference quirk couples the batch axis).  MEASURED
    # SLOWER on v5e at the recipe shape (210 vs 160 ms/step, bf16 256^2
    # B=8): XLA schedules the narrow per-sweep graphs better than the
    # wide batched ones.  "auto" therefore resolves to OFF; kept as an
    # explicit option (exactness-tested) for stacks where it wins.
    fused_sweeps: str | bool = "auto"


@dataclass(frozen=True)
class VideoTrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    epoch_start: int = 21
    epoch_end: int = 30
    batch_size: int = 2
    image_batch_size: int = 8  # checkpoint-resume filename keys off this
    lr: float = 1e-4
    lambda_gs: float = 100.0
    lambda_lf: float = 15.0
    lambda_ot: float = 2.0
    lambda_ft: float = 2.0
    lambda_id1: float = 5e-2
    lambda_id2: float = 1e-1
    style_size: Tuple[int, int] = (256, 256)
    content_size: Tuple[int, int] = (256, 512)
    remat: bool = False
    compute_dtype: str = "float32"


@dataclass(frozen=True)
class InferConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    image_size: Tuple[int, int] = (512, 512)
    # compute dtype for the jitted forward ("float32" | "bfloat16")
    dtype: str = "float32"
