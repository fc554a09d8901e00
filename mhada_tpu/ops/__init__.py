from .resize import resize_bilinear, upsample2x, resize_matrix
from .instance_norm import instance_norm
from .pad_conv import conv2d, reflect_pad2d, conv2d_reflect, max_pool2d
from .warp import grid_sample, warp, flow_warp_mask
from .mhada import mhada_attention, adaattn_single

__all__ = [
    "resize_bilinear",
    "upsample2x",
    "resize_matrix",
    "instance_norm",
    "conv2d",
    "reflect_pad2d",
    "conv2d_reflect",
    "max_pool2d",
    "grid_sample",
    "warp",
    "flow_warp_mask",
    "mhada_attention",
    "adaattn_single",
]
