from . import losses
from .train_image import ImageTrainConfig, make_image_train_step, create_train_state
from .train_video import VideoTrainConfig, make_video_train_step

__all__ = [
    "losses",
    "ImageTrainConfig",
    "make_image_train_step",
    "create_train_state",
    "VideoTrainConfig",
    "make_video_train_step",
]
