from .vit import VisionTransformer, VisionTransformerMultiScale
from .adaformer import AdaFormer, AdaAttnMultiHead, adaattn_for_loss
from .decoder import Decoder
from .vgg19 import VGG19Features, imagenet_normalize
from .raft import RAFT, import_raft

__all__ = [
    "RAFT",
    "import_raft",
    "VisionTransformer",
    "VisionTransformerMultiScale",
    "AdaFormer",
    "AdaAttnMultiHead",
    "adaattn_for_loss",
    "Decoder",
    "VGG19Features",
    "imagenet_normalize",
]
