"""Stacked2d core — neuralpredictors-style stacked convolutional core
(reference src/v1t/models/core/stacked2d.py:315-601).

Capability parity with the reference's default configuration:
- layer 0: plain Conv2d(input_kern=9, VALID) -> BatchNorm -> AdaptiveELU,
- layers 1..L-1: depth-separable convs (1x1 -> depthwise kxk 'same' ->
  1x1; stacked2d.py:244-274) -> BatchNorm -> AdaptiveELU -> Dropout (except
  the last layer),
- ``linear`` flag removes the nonlinearities (stacked2d.py:403, 474-481),
- ``stack=-1``: output is the last layer's feature map (stacked2d.py:592-601),
- regularizer = gamma_input * |laplace(first conv filters)|^2 / |filters|^2
  + gamma_hidden * group sparsity (ignored for depth-separable convs, like
  the reference; stacked2d.py:552-583),
- behavior modes 0/1 only (stacked2d.py:353-354).

BatchNorm carries running statistics in the flax ``batch_stats`` collection;
the trainer threads that state automatically.
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from v1t_tpu.models.registry import register_core

Dtype = t.Any


def adaptive_elu(x: jax.Array, xshift: float = 0.0, yshift: float = 0.0):
    """ELU shifted by (xshift, yshift) (reference stacked2d.py:120-133)."""
    return jax.nn.elu(x - xshift) + yshift


def laplace_kernel() -> np.ndarray:
    return np.array(
        [[0, -1, 0], [-1, 4, -1], [0, -1, 0]], np.float32
    )[None, None]


def laplace_l2_norm(weights: jax.Array) -> jax.Array:
    """|laplace(filters)|^2 / |filters|^2 over an (O, I, K, K) conv weight
    (reference stacked2d.py:225-241)."""
    o, i, k1, k2 = weights.shape
    flat = weights.reshape(o * i, 1, k1, k2)
    kern = jnp.asarray(laplace_kernel())
    conv = jax.lax.conv_general_dilated(
        flat, kern, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return jnp.sum(jnp.square(conv)) / jnp.sum(jnp.square(flat))


class DepthSeparableConv(nn.Module):
    """1x1 -> depthwise kxk -> 1x1 (reference stacked2d.py:244-274).
    Operates on NHWC."""

    out_channels: int
    kernel_size: int
    padding: int
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        xavier = nn.initializers.xavier_normal()
        x = nn.Conv(
            self.out_channels, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=xavier, name="in_depth_conv",
        )(x)
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            padding=self.padding,
            feature_group_count=self.out_channels,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=xavier,
            name="spatial_conv",
        )(x)
        x = nn.Conv(
            self.out_channels, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=xavier, name="out_depth_conv",
        )(x)
        return x


@register_core("stacked2d")
class Stacked2dCore(nn.Module):
    image_shape: t.Tuple[int, int, int]
    mouse_ids: t.Tuple[str, ...] = ()
    behavior_mode: int = 0
    num_layers: int = 4
    hidden_channels: int = 64
    input_kern: int = 9
    hidden_kern: int = 7
    dropout: float = 0.0
    linear: bool = False
    use_bias: bool = True
    momentum: float = 0.9
    gamma_input: float = 6.3831
    gamma_hidden: float = 0.0
    dtype: Dtype = None

    @classmethod
    def from_config(cls, config, image_shape, mouse_ids, dtype=None):
        if config.behavior_mode not in (0, 1):
            raise ValueError("stacked2d core only support behavior mode 0 and 1.")
        return cls(
            image_shape=tuple(image_shape),
            mouse_ids=tuple(mouse_ids),
            behavior_mode=config.behavior_mode,
            num_layers=config.num_layers,
            dropout=config.dropout,
            linear=config.linear,
            gamma_input=config.core_reg_input,
            gamma_hidden=config.core_reg_hidden,
            dtype=dtype,
        )

    @property
    def output_shape(self) -> t.Tuple[int, int, int]:
        _, h, w = self.image_shape
        return (
            self.hidden_channels,
            h - self.input_kern + 1,
            w - self.input_kern + 1,
        )

    @nn.compact
    def __call__(
        self, inputs, mouse_id: str, behaviors, pupil_centers, train: bool = False
    ):
        x = jnp.transpose(inputs, (0, 2, 3, 1))  # NCHW -> NHWC
        # layer 0: plain conv, VALID padding, no bias when batch-normed
        x = nn.Conv(
            self.hidden_channels,
            (self.input_kern, self.input_kern),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_normal(),
            name="layer0_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.momentum,
            name="layer0_norm",
        )(x)
        if not self.linear:
            x = adaptive_elu(x)

        hidden_padding = (self.hidden_kern - 1 + 1) // 2
        for layer in range(1, self.num_layers):
            x = DepthSeparableConv(
                out_channels=self.hidden_channels,
                kernel_size=self.hidden_kern,
                padding=hidden_padding,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name=f"layer{layer}_ds_conv",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=self.momentum,
                name=f"layer{layer}_norm",
            )(x)
            if not self.linear:
                x = adaptive_elu(x)
            if layer != self.num_layers - 1:
                x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return jnp.transpose(x, (0, 3, 1, 2))  # NHWC -> NCHW

    @staticmethod
    def regularizer(params: dict, reg_scale: float, gamma_input: float = None,
                    gamma_hidden: float = 0.0) -> jax.Array:
        """gamma_input * normalized Laplace L2 on the first conv's filters
        (reference stacked2d.py:552-583). Depth-separable hidden layers skip
        group sparsity like the reference. ``reg_scale`` is accepted for
        interface uniformity; the stacked2d core uses gamma_input instead
        (falling back to reg_scale when gamma_input is None)."""
        if gamma_input is None:
            gamma_input = reg_scale
        w = params["layer0_conv"]["kernel"]  # (K, K, I, O) in flax layout
        w_oihw = jnp.transpose(w, (3, 2, 0, 1))
        return gamma_input * laplace_l2_norm(w_oihw)
