"""Linear readout: Flatten -> Dense (reference
src/v1t/models/readout/linear.py:9-35)."""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from v1t_tpu.data.cards import NeuronCard
from v1t_tpu.models.registry import register_readout
from v1t_tpu.ops.common import torch_default_bias_init, torch_default_kernel_init, l1_sum


@register_readout("linear")
class LinearReadout(nn.Module):
    input_shape: t.Tuple[int, int, int]
    neuron_card: NeuronCard
    dtype: t.Any = None

    @property
    def num_neurons(self) -> int:
        return self.neuron_card.num_neurons

    @nn.compact
    def __call__(self, inputs, shifts=None, train=False, sample=None):
        b = inputs.shape[0]
        x = inputs.reshape(b, -1)
        # torch default Linear init (reference linear.py sets none)
        return nn.Dense(
            self.num_neurons, dtype=self.dtype,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(x.shape[-1]),
            name="linear",
        )(x)

    @staticmethod
    def regularizer(params: dict, reg_scale: float) -> jax.Array:
        leaves = jax.tree_util.tree_leaves(params)
        return reg_scale * sum(l1_sum(p) for p in leaves)
