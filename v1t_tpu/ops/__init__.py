from v1t_tpu.ops.grid_sample import grid_sample, resize_bilinear
from v1t_tpu.ops.common import elu1, drop_path, unfold_patches
from v1t_tpu.ops.attention import multi_head_attention

__all__ = [
    "grid_sample",
    "resize_bilinear",
    "elu1",
    "drop_path",
    "unfold_patches",
    "multi_head_attention",
]
