"""MLP-Mixer core over image patches (reference src/v1t/models/core/mixer.py).

The reference's MixerCore.forward takes only ``inputs`` (mixer.py:112) —
signature-incompatible with Model.forward and effectively stale; here it is
wired correctly into the standard core interface (behaviors are ignored, as
in the reference design)."""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from v1t_tpu.models.registry import register_core
from v1t_tpu.ops.common import find_shape, unfold_output_size, unfold_patches, l1_sum


class MixerBlock(nn.Module):
    num_patches: int
    emb_dim: int
    token_dim: int
    channel_dim: int
    dropout: float = 0.0
    dtype: t.Any = None

    @nn.compact
    def __call__(self, x, train=False):
        # token mixing
        y = nn.LayerNorm(epsilon=1e-5)(x)
        y = jnp.swapaxes(y, 1, 2)  # (B, C, P)
        y = nn.Dense(self.token_dim, dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.num_patches, dtype=self.dtype)(y)
        y = jnp.swapaxes(y, 1, 2)
        x = x + y
        # channel mixing
        y = nn.LayerNorm(epsilon=1e-5)(x)
        y = nn.Dense(self.channel_dim, dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.emb_dim, dtype=self.dtype)(y)
        return x + y


@register_core("mixer")
class MixerCore(nn.Module):
    image_shape: t.Tuple[int, int, int]
    mouse_ids: t.Tuple[str, ...] = ()
    behavior_mode: int = 0
    patch_size: int = 8
    patch_stride: int = 1
    num_blocks: int = 4
    emb_dim: int = 128
    token_dim: int = 64
    channel_dim: int = 128
    dropout: float = 0.0
    dtype: t.Any = None

    @classmethod
    def from_config(cls, config, image_shape, mouse_ids, dtype=None):
        return cls(
            image_shape=tuple(image_shape),
            mouse_ids=tuple(mouse_ids),
            behavior_mode=config.behavior_mode,
            patch_size=config.patch_size,
            patch_stride=config.patch_stride,
            num_blocks=config.num_blocks,
            emb_dim=config.emb_dim,
            channel_dim=config.mlp_dim,
            dropout=getattr(config, "dropout", 0.0),
            dtype=dtype,
        )

    @property
    def num_patches(self) -> int:
        _, h, w = self.image_shape
        return unfold_output_size(h, self.patch_size, self.patch_stride) * (
            unfold_output_size(w, self.patch_size, self.patch_stride)
        )

    @property
    def output_shape(self) -> t.Tuple[int, int, int]:
        h, w = find_shape(self.num_patches)
        return (self.emb_dim, h, w)

    @nn.compact
    def __call__(self, inputs, mouse_id, behaviors, pupil_centers, train=False):
        patches = unfold_patches(inputs, self.patch_size, self.patch_stride)
        x = nn.Dense(self.emb_dim, dtype=self.dtype, name="projection")(patches)
        for i in range(self.num_blocks):
            x = MixerBlock(
                num_patches=self.num_patches,
                emb_dim=self.emb_dim,
                token_dim=self.token_dim,
                channel_dim=self.channel_dim,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, train=train)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        b = x.shape[0]
        h, w = find_shape(self.num_patches)
        return jnp.transpose(x.reshape(b, h, w, self.emb_dim), (0, 3, 1, 2))

    @staticmethod
    def regularizer(params: dict, reg_scale: float) -> jax.Array:
        leaves = jax.tree_util.tree_leaves(params)
        return reg_scale * sum(l1_sum(p) for p in leaves)
