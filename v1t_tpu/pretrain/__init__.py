from v1t_tpu.pretrain.ssim import ssim
from v1t_tpu.pretrain.data import (
    IMAGE_MEAN,
    IMAGE_STD,
    NUM_CLASSES,
    reverse,
    transform_image,
)

__all__ = [
    "ssim",
    "IMAGE_MEAN",
    "IMAGE_STD",
    "NUM_CLASSES",
    "reverse",
    "transform_image",
]
