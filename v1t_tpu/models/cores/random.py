"""Random control core: outputs noise but stays gradient-connected via the
+w-w trick (reference src/v1t/models/core/random.py:7-27). Null-model
baseline for sanity-checking metrics."""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from v1t_tpu.models.registry import register_core


@register_core("random")
class RandomCore(nn.Module):
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
        w = self.param("w", nn.initializers.normal(1.0), (1,))
        noise = jax.random.uniform(self.make_rng("sample"), inputs.shape)
        # gradient-connected random output
        return noise + w - jax.lax.stop_gradient(w)

    @staticmethod
    def regularizer(params: dict, reg_scale: float) -> jax.Array:
        return jnp.zeros(())
