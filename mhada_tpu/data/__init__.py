from . import flowlib
from .loader import DataLoader
from .image_folder import ImageFolder, resize_crop_255
from .coco_wikiart import CocoWikiArt, ImageNet1k
from .sceneflow import (
    FlyingThings3D,
    Monkaa,
    FlyingThings3DMonkaa,
    FlyingThings3DMonkaaWikiArt,
)
from .sintel import Sintel
from .flow_np import warp_np, flow_warp_mask_np, resize_flow_np

__all__ = [
    "flowlib",
    "DataLoader",
    "ImageFolder",
    "resize_crop_255",
    "CocoWikiArt",
    "ImageNet1k",
    "FlyingThings3D",
    "Monkaa",
    "FlyingThings3DMonkaa",
    "FlyingThings3DMonkaaWikiArt",
    "Sintel",
    "warp_np",
    "flow_warp_mask_np",
    "resize_flow_np",
]
