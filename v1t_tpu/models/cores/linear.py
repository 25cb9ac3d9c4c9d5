"""Linear baseline core: flatten -> Dense -> reshape (reference
src/v1t/models/core/linear.py:8-35, with its stale `self.shape` bug fixed)."""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from v1t_tpu.models.registry import register_core


@register_core("linear")
class LinearCore(nn.Module):
    image_shape: t.Tuple[int, int, int]
    mouse_ids: t.Tuple[str, ...] = ()
    behavior_mode: int = 0
    dtype: t.Any = None

    @classmethod
    def from_config(cls, config, image_shape, mouse_ids, dtype=None):
        return cls(
            image_shape=tuple(image_shape),
            mouse_ids=tuple(mouse_ids),
            behavior_mode=config.behavior_mode,
            dtype=dtype,
        )

    @property
    def output_shape(self) -> t.Tuple[int, int, int]:
        return tuple(self.image_shape)

    @nn.compact
    def __call__(self, inputs, mouse_id, behaviors, pupil_centers, train=False):
        from v1t_tpu.ops.common import (
            torch_default_bias_init,
            torch_default_kernel_init,
        )

        b = inputs.shape[0]
        c, h, w = self.image_shape
        x = inputs.reshape(b, -1)
        # torch default Linear init (reference linear.py sets none)
        x = nn.Dense(
            features=c * h * w, dtype=self.dtype,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(x.shape[-1]),
            name="linear",
        )(x)
        return x.reshape(b, c, h, w)

    @staticmethod
    def regularizer(params: dict, reg_scale: float) -> jax.Array:
        leaves = jax.tree_util.tree_leaves(params)
        from v1t_tpu.ops.common import l1_sum

        return reg_scale * sum(l1_sum(p) for p in leaves)
