"""Stacked2d core — neuralpredictors-style stacked convolutional core
(reference src/v1t/models/core/stacked2d.py:315-601).

Capability parity, including every reference variant:
- layer 0: plain Conv2d(input_kern, VALID unless ``pad_input``) -> norm ->
  AdaptiveELU (stacked2d.py:483-496),
- layers 1..L-1 use one of three conv types (stacked2d.py:410-421):
  * ``ds`` (default): depth-separable 1x1 -> depthwise kxk -> 1x1
    (stacked2d.py:244-274),
  * ``attention``: stand-alone self-attention in kxk windows with relative
    row/column embeddings (AttentionConv, stacked2d.py:19-117),
  * ``conv``: plain Conv2d — the only type whose hidden weights get group
    sparsity regularization (stacked2d.py:552-583),
- ``skip`` > 1: layer l's input is the concat of the last min(skip, l)
  feature maps (stacked2d.py:592-599),
- ``stack``: the core output concatenates the listed layers' feature maps
  (int -> range(num_layers)[stack:]; default -1 = last layer only,
  stacked2d.py:427-433, 601),
- batch-norm variants (stacked2d.py:445-472): ``independent_bn_bias`` uses
  a full affine BatchNorm; otherwise affine is decomposed into the BN flags
  + explicit Bias2D/Scale2D layers exactly like the reference,
- ``final_nonlinearity`` / ``elu_shift`` / ``linear`` control activations,
- channel-wise Dropout2d between hidden layers (stacked2d.py:522),
- regularizer = gamma_input * |laplace(first conv)|^2 / |conv|^2
  + gamma_hidden * group sparsity (plain-conv stacks only).

BatchNorm running statistics live in the flax ``batch_stats`` collection;
the trainer threads that state automatically.

Note: the reference hardcodes output_shape to the single-layer VALID-conv
shape (stacked2d.py:430-434), which is wrong for stack/pad_input/stride
variants; this implementation computes the true shape.
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from v1t_tpu.models.norm import TorchBatchNorm
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


_xavier = nn.initializers.xavier_normal()
_kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class DepthSeparableConv(nn.Module):
    """1x1 -> depthwise kxk -> 1x1 (reference stacked2d.py:244-274).
    Operates on NHWC."""

    out_channels: int
    kernel_size: int
    padding: int
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.out_channels, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=_xavier, name="in_depth_conv",
        )(x)
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=self.padding,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.out_channels,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=_xavier,
            name="spatial_conv",
        )(x)
        x = nn.Conv(
            self.out_channels, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=_xavier, name="out_depth_conv",
        )(x)
        return x


class AttentionConv(nn.Module):
    """Stand-alone self-attention within kxk windows (reference
    stacked2d.py:19-117; Ramachandran et al. 2019, arXiv:1906.05909).

    q/k/v come from 1x1 convs; keys/values are unfolded into kxk windows
    around each output position; the key windows get relative row/column
    embeddings (first half of the channels + rel_h, second half + rel_w);
    attention weights are a per-(channel, position) softmax over the window.
    Operates on NHWC like the other conv layers.
    """

    out_channels: int
    kernel_size: int
    padding: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.out_channels % self.groups == 0
        assert self.out_channels % 2 == 0
        b = x.shape[0]
        k, s, p = self.kernel_size, self.stride, self.padding
        c = self.out_channels

        conv1x1 = lambda name: nn.Conv(
            c, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=_kaiming_out, name=name,
        )
        q = conv1x1("query_conv")(x)  # (B, H, W, C) — stride-1 like the ref
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        key = conv1x1("key_conv")(xp)
        val = conv1x1("value_conv")(xp)

        rel_h = self.param(
            "rel_h", nn.initializers.normal(1.0), (c // 2, 1, 1, k, 1)
        )
        rel_w = self.param(
            "rel_w", nn.initializers.normal(1.0), (c // 2, 1, 1, 1, k)
        )

        def unfold(y):
            # (B, Hp, Wp, C) -> (B, C*k*k, H', W') with channel order
            # (C, kh, kw), then -> (B, C, H', W', kh, kw)
            y = jnp.transpose(y, (0, 3, 1, 2))
            patches = jax.lax.conv_general_dilated_patches(
                y, filter_shape=(k, k), window_strides=(s, s), padding="VALID"
            )
            _, _, hh, ww = patches.shape
            patches = patches.reshape(b, c, k, k, hh, ww)
            return jnp.transpose(patches, (0, 1, 4, 5, 2, 3))

        key = unfold(key)  # (B, C, H, W, k, k)
        val = unfold(val)
        hh, ww = key.shape[2], key.shape[3]

        key = jnp.concatenate(
            [
                key[:, : c // 2] + rel_h[None].astype(key.dtype),
                key[:, c // 2 :] + rel_w[None].astype(key.dtype),
            ],
            axis=1,
        )
        key = key.reshape(b, self.groups, c // self.groups, hh, ww, k * k)
        val = val.reshape(b, self.groups, c // self.groups, hh, ww, k * k)
        qg = jnp.transpose(q, (0, 3, 1, 2)).reshape(
            b, self.groups, c // self.groups, q.shape[1], q.shape[2], 1
        )
        att = jax.nn.softmax(qg * key, axis=-1)
        out = jnp.sum(att * val, axis=-1)  # (B, G, C/G, H, W)
        out = out.reshape(b, c, hh, ww)
        return jnp.transpose(out, (0, 2, 3, 1))  # NHWC


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
    # TORCH-convention BN momentum (weight of the new batch statistic):
    # the reference passes 0.9 (stacked2d.py:335) — running stats track
    # the latest batches almost entirely
    momentum: float = 0.9
    gamma_input: float = 6.3831
    gamma_hidden: float = 0.0
    conv_type: str = "ds"  # "ds" | "attention" | "conv"
    skip: int = 0
    stack: t.Union[int, t.Tuple[int, ...]] = -1
    stride: int = 1
    dilation: int = 1
    pad_input: bool = False
    hidden_padding: t.Optional[int] = None
    batch_norm: bool = True
    independent_bn_bias: bool = True
    batch_norm_scale: bool = True
    final_batchnorm_scale: bool = True
    final_nonlinearity: bool = True
    elu_shift: t.Tuple[float, float] = (0.0, 0.0)
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
            conv_type=getattr(config, "stacked2d_conv_type", "ds"),
            skip=getattr(config, "stacked2d_skip", 0),
            stack=getattr(config, "stacked2d_stack", -1),
            pad_input=bool(getattr(config, "stacked2d_pad_input", 0)),
            batch_norm=bool(getattr(config, "stacked2d_batch_norm", 1)),
            independent_bn_bias=bool(
                getattr(config, "stacked2d_independent_bn_bias", 1)
            ),
            batch_norm_scale=bool(
                getattr(config, "stacked2d_batch_norm_scale", 1)
            ),
            final_batchnorm_scale=bool(
                getattr(config, "stacked2d_final_batchnorm_scale", 1)
            ),
            final_nonlinearity=bool(
                getattr(config, "stacked2d_final_nonlinearity", 1)
            ),
            dtype=dtype,
        )

    @property
    def stack_layers(self) -> t.Tuple[int, ...]:
        if isinstance(self.stack, int):
            return tuple(range(self.num_layers)[self.stack :])
        return tuple(self.stack)

    @property
    def _hidden_padding(self) -> int:
        if self.hidden_padding is not None:
            return self.hidden_padding
        return ((self.hidden_kern - 1) * self.dilation + 1) // 2

    @property
    def output_shape(self) -> t.Tuple[int, int, int]:
        _, h, w = self.image_shape
        if not self.pad_input:
            h, w = h - self.input_kern + 1, w - self.input_kern + 1
        # hidden layers: 'same'-style padding at the configured stride
        for _ in range(1, self.num_layers):
            span = (self.hidden_kern - 1) * self.dilation + 1
            h = (h + 2 * self._hidden_padding - span) // self.stride + 1
            w = (w + 2 * self._hidden_padding - span) // self.stride + 1
        return (self.hidden_channels * len(self.stack_layers), h, w)

    def _add_norm(self, x, layer_idx: int, train: bool):
        """BatchNorm variants (reference stacked2d.py:445-472)."""
        if not self.batch_norm:
            return x
        is_final = layer_idx == self.num_layers - 1
        if self.independent_bn_bias:
            return TorchBatchNorm(
                momentum=self.momentum, name=f"layer{layer_idx}_norm",
            )(x, use_running_average=not train)
        affine = (
            self.use_bias
            and self.batch_norm_scale
            and (not is_final or self.final_batchnorm_scale)
        )
        x = TorchBatchNorm(
            momentum=self.momentum, use_bias=affine, use_scale=affine,
            name=f"layer{layer_idx}_norm",
        )(x, use_running_average=not train)
        if self.use_bias and (
            not self.batch_norm_scale
            or (is_final and not self.final_batchnorm_scale)
        ):
            bias = self.param(
                f"layer{layer_idx}_bias2d", nn.initializers.zeros,
                (x.shape[-1],),
            )
            x = x + bias.astype(x.dtype)
        elif self.batch_norm_scale and not (
            is_final and not self.final_batchnorm_scale
        ):
            scale = self.param(
                f"layer{layer_idx}_scale2d", nn.initializers.ones,
                (x.shape[-1],),
            )
            x = x * scale.astype(x.dtype)
        return x

    def _activation(self, x, layer_idx: int):
        if self.linear:
            return x
        if layer_idx == self.num_layers - 1 and not self.final_nonlinearity:
            return x
        return adaptive_elu(x, *self.elu_shift)

    @nn.compact
    def __call__(
        self, inputs, mouse_id: str, behaviors, pupil_centers, train: bool = False
    ):
        x = jnp.transpose(inputs, (0, 2, 3, 1))  # NCHW -> NHWC
        # layer 0: plain conv; bias only without batch norm (ref :486-490)
        x = nn.Conv(
            self.hidden_channels,
            (self.input_kern, self.input_kern),
            padding=self.input_kern // 2 if self.pad_input else "VALID",
            use_bias=self.use_bias and not self.batch_norm,
            dtype=self.dtype,
            kernel_init=_xavier,
            bias_init=nn.initializers.zeros,
            name="layer0_conv",
        )(x)
        x = self._add_norm(x, 0, train)
        x = self._activation(x, 0)
        outputs = [x]

        for layer in range(1, self.num_layers):
            if self.skip > 1:
                x = jnp.concatenate(outputs[-min(self.skip, layer):], axis=-1)
            common = dict(
                out_channels=self.hidden_channels,
                kernel_size=self.hidden_kern,
                padding=self._hidden_padding,
                stride=self.stride,
                use_bias=self.use_bias,
                dtype=self.dtype,
            )
            if self.conv_type == "ds":
                x = DepthSeparableConv(
                    dilation=self.dilation,
                    name=f"layer{layer}_ds_conv", **common,
                )(x)
            elif self.conv_type == "attention":
                x = AttentionConv(
                    name=f"layer{layer}_attention_conv", **common
                )(x)
            elif self.conv_type == "conv":
                x = nn.Conv(
                    self.hidden_channels,
                    (self.hidden_kern, self.hidden_kern),
                    strides=(self.stride, self.stride),
                    padding=self._hidden_padding,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=self.use_bias,
                    dtype=self.dtype,
                    kernel_init=_xavier,
                    bias_init=nn.initializers.zeros,
                    name=f"layer{layer}_conv",
                )(x)
            else:
                raise ValueError(f"unknown stacked2d conv_type {self.conv_type!r}")
            x = self._add_norm(x, layer, train)
            x = self._activation(x, layer)
            if layer != self.num_layers - 1:
                # Dropout2d: drop whole channels (reference stacked2d.py:522)
                x = nn.Dropout(
                    rate=self.dropout, deterministic=not train,
                    broadcast_dims=(1, 2),
                )(x)
            outputs.append(x)

        out = jnp.concatenate(
            [outputs[i] for i in self.stack_layers], axis=-1
        )
        return jnp.transpose(out, (0, 3, 1, 2))  # NHWC -> NCHW

    @staticmethod
    def regularizer(params: dict, reg_scale: float, gamma_input: float = None,
                    gamma_hidden: float = 0.0) -> jax.Array:
        """gamma_input * normalized Laplace L2 on the first conv's filters +
        gamma_hidden * group sparsity over plain-conv hidden weights
        (reference stacked2d.py:552-583). Depth-separable and attention
        stacks skip group sparsity like the reference. ``reg_scale`` is
        accepted for interface uniformity; the stacked2d core uses
        gamma_input instead (falling back to reg_scale when None)."""
        if gamma_input is None:
            gamma_input = reg_scale
        w = params["layer0_conv"]["kernel"]  # (K, K, I, O) in flax layout
        w_oihw = jnp.transpose(w, (3, 2, 0, 1))
        reg = gamma_input * laplace_l2_norm(w_oihw)
        if gamma_hidden > 0.0:
            hidden = [
                params[name]["kernel"]
                for name in sorted(params)
                if name.endswith("_conv") and name != "layer0_conv"
                and "kernel" in params[name]
            ]
            if hidden:
                # sqrt of the spatial L2 per (in, out) filter, averaged
                # (reference group_sparsity, stacked2d.py:560-576)
                gs = sum(
                    jnp.mean(jnp.sqrt(jnp.sum(jnp.square(k), axis=(0, 1))))
                    for k in hidden
                ) / max(len(hidden), 1)
                reg = reg + gamma_hidden * gs
        return reg
