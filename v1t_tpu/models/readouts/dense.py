"""Dense readout: Flatten -> Dense -> GELU -> Dropout(0.25) -> Dense
(reference src/v1t/models/readout/dense.py:9-41)."""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from v1t_tpu.data.cards import NeuronCard
from v1t_tpu.models.registry import register_readout
from v1t_tpu.ops.common import torch_default_bias_init, torch_default_kernel_init, l1_sum


@register_readout("dense")
class DenseReadout(nn.Module):
    input_shape: t.Tuple[int, int, int]
    neuron_card: NeuronCard
    # hidden width = num_neurons // 2, matching the reference's
    # out_features // 2 (dense.py:27-37); overridable for experiments
    hidden_dim: t.Optional[int] = None
    dropout: float = 0.25
    dtype: t.Any = None

    @property
    def num_neurons(self) -> int:
        return self.neuron_card.num_neurons

    @property
    def _hidden(self) -> int:
        return self.hidden_dim or self.num_neurons // 2

    @nn.compact
    def __call__(self, inputs, shifts=None, train=False, sample=None):
        b = inputs.shape[0]
        x = inputs.reshape(b, -1)
        # torch default Linear init (reference dense.py sets none)
        x = nn.Dense(
            self._hidden, dtype=self.dtype,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(x.shape[-1]),
            name="fc1",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        x = nn.Dense(
            self.num_neurons, dtype=self.dtype,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(self._hidden),
            name="fc2",
        )(x)
        return x

    @staticmethod
    def regularizer(params: dict, reg_scale: float) -> jax.Array:
        leaves = jax.tree_util.tree_leaves(params)
        return reg_scale * sum(l1_sum(p) for p in leaves)
