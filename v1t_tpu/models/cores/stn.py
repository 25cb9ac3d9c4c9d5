"""Spatial Transformer core (reference src/v1t/models/core/stn.py:13-139).

Localization CNN -> affine regressor (identity init) -> affine_grid +
bilinear grid_sample -> residual CNN stack (first block plain, later blocks
residual adds). ``affine_grid`` reproduces torch's align_corners=True
semantics: base normalized coords [x, y, 1] mapped through the predicted
2x3 theta.
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from v1t_tpu.models.norm import TorchBatchNorm
from v1t_tpu.models.registry import register_core
from v1t_tpu.ops.grid_sample import grid_sample

Dtype = t.Any


def affine_grid(theta: jax.Array, height: int, width: int) -> jax.Array:
    """(B, 2, 3) affine matrices -> (B, H, W, 2) sampling grid; torch
    F.affine_grid with align_corners=True."""
    b = theta.shape[0]
    xs = jnp.linspace(-1.0, 1.0, width)
    ys = jnp.linspace(-1.0, 1.0, height)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1).reshape(1, height * width, 3)
    grid = jnp.einsum("bnk,bjk->bnj", jnp.tile(base, (b, 1, 1)), theta)
    return grid.reshape(b, height, width, 2)


def _conv_out(size: int, kernel: int, stride: int = 1, padding: int = 0) -> int:
    return (size + 2 * padding - kernel) // stride + 1


@register_core("stn")
class SpatialTransformerCore(nn.Module):
    image_shape: t.Tuple[int, int, int]
    mouse_ids: t.Tuple[str, ...] = ()
    behavior_mode: int = 0
    num_layers: int = 7
    num_filters: int = 63
    dropout: float = 0.1135
    dtype: Dtype = None

    @classmethod
    def from_config(cls, config, image_shape, mouse_ids, dtype=None):
        return cls(
            image_shape=tuple(image_shape),
            mouse_ids=tuple(mouse_ids),
            behavior_mode=config.behavior_mode,
            num_layers=config.num_layers,
            num_filters=config.num_filters,
            dropout=config.dropout,
            dtype=dtype,
        )

    @property
    def output_shape(self) -> t.Tuple[int, int, int]:
        _, h, w = self.image_shape
        return (self.num_filters, _conv_out(h, 9), _conv_out(w, 9))

    @nn.compact
    def __call__(
        self, inputs, mouse_id: str, behaviors, pupil_centers, train: bool = False
    ):
        from v1t_tpu.ops.common import (
            torch_default_bias_init,
            torch_default_kernel_init,
        )

        def _torch_conv(features, kernel, fan_in, name, padding="VALID"):
            # torch default Conv2d init (reference stn.py sets no custom
            # init except the identity regressor)
            return nn.Conv(
                features, kernel, padding=padding, dtype=self.dtype,
                kernel_init=torch_default_kernel_init,
                bias_init=torch_default_bias_init(fan_in),
                name=name,
            )

        b, c, h, w = inputs.shape
        x_nhwc = jnp.transpose(inputs, (0, 2, 3, 1))

        # --- localization network (stn.py:34-41) ---
        loc = _torch_conv(8, (7, 7), c * 49, "loc_conv1")(x_nhwc)
        loc = nn.max_pool(loc, (2, 2), strides=(2, 2))
        loc = nn.relu(loc)
        loc = _torch_conv(10, (5, 5), 8 * 25, "loc_conv2")(loc)
        loc = nn.max_pool(loc, (2, 2), strides=(2, 2))
        loc = nn.relu(loc)

        # --- affine regressor with identity init (stn.py:50-61) ---
        flat = loc.reshape(b, -1)
        reg = nn.Dense(
            32, dtype=self.dtype,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(flat.shape[-1]),
            name="reg_fc1",
        )(flat)
        reg = nn.relu(reg)
        theta = nn.Dense(
            6,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                [1, 0, 0, 0, 1, 0], dtype
            ),
            name="reg_fc2",
        )(reg)
        theta = theta.reshape(b, 2, 3).astype(jnp.float32)

        grid = affine_grid(theta, h, w)
        outputs = grid_sample(inputs, grid, mode="bilinear")

        # --- residual CNN stack (stn.py:80-114, 137-138) ---
        x = jnp.transpose(outputs, (0, 2, 3, 1))
        x = _torch_conv(self.num_filters, (9, 9), c * 81, "block1_conv")(x)
        x = TorchBatchNorm(name="block1_bn")(x, use_running_average=not train)
        x = nn.gelu(x, approximate=False)
        # Dropout2d: drop whole channels (reference stn.py uses nn.Dropout2d)
        x = nn.Dropout(
            rate=self.dropout, deterministic=not train, broadcast_dims=(1, 2)
        )(x)
        for i in range(1, self.num_layers):
            y = _torch_conv(
                self.num_filters, (3, 3), self.num_filters * 9,
                f"block{i + 1}_conv", padding=1,
            )(x)
            y = TorchBatchNorm(name=f"block{i + 1}_bn")(y, use_running_average=not train)
            y = nn.gelu(y, approximate=False)
            if i < self.num_layers - 1:
                y = nn.Dropout(
                    rate=self.dropout, deterministic=not train,
                    broadcast_dims=(1, 2),
                )(y)
            x = y + x  # residual add (stn.py:138)
        return jnp.transpose(x, (0, 3, 1, 2))

    @staticmethod
    def regularizer(params: dict, reg_scale: float) -> jax.Array:
        leaves = jax.tree_util.tree_leaves(params)
        from v1t_tpu.ops.common import l1_sum

        return reg_scale * sum(l1_sum(p) for p in leaves)
