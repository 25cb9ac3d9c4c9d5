"""CCT core — Compact Convolutional Transformer (reference
src/v1t/models/core/cct.py).

Capability parity:
- ``Tokenizer``: Conv2d(patch_size, stride, padding=3) -> ReLU ->
  MaxPool(3, 2, 1) -> tokens; sine / learned / no positional embedding
  (cct.py:29-98),
- per-head dim = emb_dim // num_heads (cct.py:105 — unlike the vit core's
  emb_dim * num_heads), q pre-scaled by inner_dim^-0.5,
- per-block DropPath rates ramp linearly 0 -> drop_path (cct.py:209),
- BehaviorMLP per block for behavior modes 1-4 (cct.py:164-168).
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from v1t_tpu.models.cores.vit import MLP, BehaviorMLP, trunc_normal_init
from v1t_tpu.models.registry import register_core
from v1t_tpu.ops.attention import multi_head_attention
from v1t_tpu.ops.common import drop_path, find_shape, l1_sum

Dtype = t.Any


def sinusoidal_embedding(num_channels: int, dim: int) -> np.ndarray:
    """(1, num_channels, dim) sine/cosine table (reference cct.py:17-26)."""
    pe = np.array(
        [
            [p / (10000 ** (2 * (i // 2) / dim)) for i in range(dim)]
            for p in range(num_channels)
        ],
        np.float32,
    )
    pe[:, 0::2] = np.sin(pe[:, 0::2])
    pe[:, 1::2] = np.cos(pe[:, 1::2])
    return pe[None]


def _conv_out(size: int, kernel: int, stride: int, padding: int) -> int:
    return (size + 2 * padding - kernel) // stride + 1


class Tokenizer(nn.Module):
    image_shape: t.Tuple[int, int, int]
    patch_size: int
    stride: int
    emb_dim: int
    padding: int = 3
    dropout: float = 0.0
    use_bias: bool = False
    pos_emb: str = "sine"
    dtype: Dtype = None

    @property
    def grid_shape(self) -> t.Tuple[int, int]:
        _, h, w = self.image_shape
        ch = _conv_out(h, self.patch_size, self.stride, self.padding)
        cw = _conv_out(w, self.patch_size, self.stride, self.padding)
        # MaxPool2d(kernel=3, stride=2, padding=1)
        ph = _conv_out(ch, 3, 2, 1)
        pw = _conv_out(cw, 3, 2, 1)
        return ph, pw

    @property
    def num_patches(self) -> int:
        ph, pw = self.grid_shape
        return ph * pw

    @nn.compact
    def __call__(self, inputs: jax.Array, train: bool = False) -> jax.Array:
        assert self.pos_emb in ("sine", "learn", "none")
        b = inputs.shape[0]
        x = jnp.transpose(inputs, (0, 2, 3, 1))  # NCHW -> NHWC
        from v1t_tpu.ops.common import torch_default_bias_init

        c_in = inputs.shape[1]
        x = nn.Conv(
            features=self.emb_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.stride, self.stride),
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            # reference Tokenizer.init_weight: kaiming_normal_ on the conv
            # weight only (cct.py:82-84); the bias keeps the torch default
            kernel_init=nn.initializers.variance_scaling(
                2.0, "fan_in", "normal"
            ),
            bias_init=torch_default_bias_init(
                c_in * self.patch_size * self.patch_size
            ),
            name="conv2d",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(
            x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        tokens = x.reshape(b, -1, self.emb_dim)

        if self.pos_emb == "learn":
            pos = self.param(
                "pos_embedding",
                nn.initializers.truncated_normal(stddev=0.2),
                (1, self.num_patches, self.emb_dim),
            )
            tokens = tokens + pos.astype(tokens.dtype)
        elif self.pos_emb == "sine":
            tokens = tokens + jnp.asarray(
                sinusoidal_embedding(self.num_patches, self.emb_dim)
            ).astype(tokens.dtype)
        tokens = nn.Dropout(rate=self.dropout, deterministic=not train)(tokens)
        return tokens


class CCTAttention(nn.Module):
    """Attention with inner_dim = emb_dim // num_heads (reference
    cct.py:101-136)."""

    emb_dim: int
    num_heads: int = 8
    dropout: float = 0.0
    dtype: Dtype = None
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, inputs: jax.Array, train: bool = False) -> jax.Array:
        b, n, _ = inputs.shape
        inner_dim = self.emb_dim // self.num_heads
        assert inner_dim % self.num_heads == 0
        head_dim = inner_dim // self.num_heads

        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(inputs)
        qkv = nn.Dense(
            features=inner_dim * 3,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            name="qkv",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(y):
            return jnp.transpose(
                y.reshape(b, n, self.num_heads, head_dim), (0, 2, 1, 3)
            )

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        scale = jnp.asarray(inner_dim**-0.5, jnp.float32)

        rng = None
        if self.dropout > 0.0 and train:
            rng = self.make_rng("dropout")
        out = multi_head_attention(
            q, k, v, scale,
            use_lsa=False,
            dropout_rate=self.dropout,
            deterministic=not train,
            rng=rng,
            impl=self.attention_impl,
        )
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, inner_dim)
        out = nn.Dense(
            features=self.emb_dim,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            bias_init=nn.initializers.zeros,
            name="projection",
        )(out)
        out = nn.Dropout(rate=self.dropout, deterministic=not train)(out)
        return out


class CCTBlock(nn.Module):
    behavior_mode: int
    emb_dim: int
    num_heads: int
    mlp_dim: int
    dropout: float
    drop_path_rate: float
    mouse_ids: t.Tuple[str, ...]
    dtype: Dtype = None
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, inputs, mouse_id: str, behaviors, train: bool = False):
        outputs = inputs
        if self.behavior_mode in (1, 2, 3, 4):
            b_latent = BehaviorMLP(
                behavior_mode=max(self.behavior_mode, 2),
                out_dim=self.emb_dim,
                mouse_ids=self.mouse_ids,
                dtype=self.dtype,
                name="b_mlp",
            )(behaviors, mouse_id=mouse_id)
            outputs = outputs + b_latent[:, None, :].astype(outputs.dtype)

        mha_out = CCTAttention(
            emb_dim=self.emb_dim,
            num_heads=self.num_heads,
            dropout=self.dropout,
            dtype=self.dtype,
            attention_impl=self.attention_impl,
            name="mha",
        )(outputs, train=train)
        outputs = self._drop_path(mha_out, train) + outputs
        mlp_out = MLP(
            hidden_dim=self.mlp_dim,
            out_dim=self.emb_dim,
            dropout=self.dropout,
            dtype=self.dtype,
            name="mlp",
        )(outputs, train=train)
        outputs = self._drop_path(mlp_out, train) + outputs
        return outputs

    def _drop_path(self, x, train):
        if self.drop_path_rate == 0.0 or not train:
            return x
        return drop_path(
            x, rate=self.drop_path_rate, deterministic=False,
            rng=self.make_rng("droppath"),
        )


@register_core("cct")
class CCTCore(nn.Module):
    image_shape: t.Tuple[int, int, int]
    mouse_ids: t.Tuple[str, ...]
    behavior_mode: int = 0
    patch_size: int = 8
    patch_stride: int = 1
    num_blocks: int = 4
    num_heads: int = 4
    emb_dim: int = 160
    mlp_dim: int = 488
    p_dropout: float = 0.0
    t_dropout: float = 0.0
    drop_path_rate: float = 0.0
    pos_emb: str = "sine"
    dtype: Dtype = None
    attention_impl: str = "auto"

    @classmethod
    def from_config(cls, config, image_shape, mouse_ids, dtype=None):
        return cls(
            image_shape=tuple(image_shape),
            mouse_ids=tuple(mouse_ids),
            behavior_mode=config.behavior_mode,
            patch_size=config.patch_size,
            patch_stride=config.patch_stride,
            num_blocks=config.num_blocks,
            num_heads=config.num_heads,
            emb_dim=config.emb_dim,
            mlp_dim=int(config.mlp_dim),
            p_dropout=config.p_dropout,
            t_dropout=config.t_dropout,
            drop_path_rate=config.drop_path,
            pos_emb=config.pos_emb,
            dtype=dtype,
            attention_impl=config.attention_impl,
        )

    @property
    def num_patches(self) -> int:
        return Tokenizer(
            image_shape=self.image_shape,
            patch_size=self.patch_size,
            stride=self.patch_stride,
            emb_dim=self.emb_dim,
        ).num_patches

    @property
    def output_shape(self) -> t.Tuple[int, int, int]:
        h, w = find_shape(self.num_patches)
        return (self.emb_dim, h, w)

    @nn.compact
    def __call__(
        self, inputs, mouse_id: str, behaviors, pupil_centers, train: bool = False
    ):
        tokens = Tokenizer(
            image_shape=self.image_shape,
            patch_size=self.patch_size,
            stride=self.patch_stride,
            emb_dim=self.emb_dim,
            dropout=self.p_dropout,
            pos_emb=self.pos_emb,
            dtype=self.dtype,
            name="tokenizer",
        )(inputs, train=train)

        if self.behavior_mode in (3, 4):
            behaviors = jnp.concatenate([behaviors, pupil_centers], axis=-1)

        # per-block DropPath ramp 0 -> drop_path (reference cct.py:209)
        rates = np.linspace(0, self.drop_path_rate, self.num_blocks)
        outputs = tokens
        for i in range(self.num_blocks):
            outputs = CCTBlock(
                behavior_mode=self.behavior_mode,
                emb_dim=self.emb_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                dropout=self.t_dropout,
                drop_path_rate=float(rates[i]),
                mouse_ids=self.mouse_ids,
                dtype=self.dtype,
                attention_impl=self.attention_impl,
                name=f"block{i}",
            )(outputs, mouse_id=mouse_id, behaviors=behaviors, train=train)

        b = outputs.shape[0]
        h, w = find_shape(self.num_patches)
        return jnp.transpose(outputs.reshape(b, h, w, self.emb_dim), (0, 3, 1, 2))

    @staticmethod
    def regularizer(params: dict, reg_scale: float) -> jax.Array:
        leaves = jax.tree_util.tree_leaves(params)
        return reg_scale * sum(l1_sum(p) for p in leaves)
