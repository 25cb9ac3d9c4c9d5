"""Pretraining task heads on top of a core (reference src/v1t/pretrain/
classification.py and reconstruction.py supply the losses/loops; the model
driver was never committed upstream — this module supplies a complete one).

- ``ClassificationModel``: core -> global average pool -> Dense(num_classes)
  -> log-softmax; NLL loss + core regularizer (classification.py:38-76).
- ``ReconstructionModel``: core -> 1x1 conv to 1 channel -> bilinear resize
  back to the input; 1-SSIM loss (reconstruction.py:158-236).

Checkpoints store the core under the standard ``core`` key so
``--pretrain_core <run>`` injects and freezes it (reference
models/utils.py:14-30).
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from v1t_tpu.configs import Config
from v1t_tpu.models.registry import get_core
from v1t_tpu.ops.grid_sample import resize_bilinear


class ClassificationModel(nn.Module):
    config: Config
    image_shape: t.Tuple[int, int, int]
    num_classes: int = 1000
    dtype: t.Any = None

    def setup(self):
        core_cls = get_core(self.config.core)
        self.core = core_cls.from_config(
            self.config, image_shape=self.image_shape, mouse_ids=("share",),
            dtype=self.dtype,
        )
        from v1t_tpu.ops.common import (
            torch_default_bias_init,
            torch_default_kernel_init,
        )

        # torch default Linear init (the reference pretrain heads set none)
        self.head = nn.Dense(
            self.num_classes,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(self.config.emb_dim),
            name="head",
        )

    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        b = images.shape[0]
        feats = self.core(
            images,
            mouse_id="share",
            behaviors=jnp.zeros((b, 3), jnp.float32),
            pupil_centers=jnp.zeros((b, 2), jnp.float32),
            train=train,
        )  # (B, C, h, w)
        pooled = feats.mean(axis=(2, 3))
        logits = self.head(pooled.astype(jnp.float32))
        return jax.nn.log_softmax(logits, axis=-1)


class ReconstructionModel(nn.Module):
    config: Config
    image_shape: t.Tuple[int, int, int]
    dtype: t.Any = None

    def setup(self):
        core_cls = get_core(self.config.core)
        self.core = core_cls.from_config(
            self.config, image_shape=self.image_shape, mouse_ids=("share",),
            dtype=self.dtype,
        )
        from v1t_tpu.ops.common import (
            torch_default_bias_init,
            torch_default_kernel_init,
        )

        self.decoder = nn.Dense(
            1,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(self.config.emb_dim),
            name="decoder",
        )

    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        b = images.shape[0]
        feats = self.core(
            images,
            mouse_id="share",
            behaviors=jnp.zeros((b, 3), jnp.float32),
            pupil_centers=jnp.zeros((b, 2), jnp.float32),
            train=train,
        )  # (B, C, h, w)
        x = jnp.transpose(feats, (0, 2, 3, 1))
        x = self.decoder(x.astype(jnp.float32))  # (B, h, w, 1)
        x = jnp.transpose(x, (0, 3, 1, 2))
        return resize_bilinear(x, self.image_shape[1], self.image_shape[2])


def nll_loss(log_probs: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean negative log-likelihood (torch F.nll_loss semantics)."""
    picked = jnp.take_along_axis(log_probs, labels[:, None], axis=1)
    return -jnp.mean(picked)
