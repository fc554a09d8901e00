from .features import feature_down_sample
from .image_io import (
    load_image,
    save_image,
    to_tensor255,
    cv2_to_tensor,
    list_files,
    list_folders,
    mkdir,
    visualize_flow,
    print_param_tree,
)

__all__ = [
    "feature_down_sample",
    "load_image",
    "save_image",
    "to_tensor255",
    "cv2_to_tensor",
    "list_files",
    "list_folders",
    "mkdir",
    "visualize_flow",
    "print_param_tree",
]
