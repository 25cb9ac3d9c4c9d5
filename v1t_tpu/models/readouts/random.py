"""Random control readout (reference src/v1t/models/readout/random.py:9-32)."""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from v1t_tpu.data.cards import NeuronCard
from v1t_tpu.models.registry import register_readout


@register_readout("random")
class RandomReadout(nn.Module):
    input_shape: t.Tuple[int, int, int]
    neuron_card: NeuronCard
    dtype: t.Any = None

    @property
    def num_neurons(self) -> int:
        return self.neuron_card.num_neurons

    @nn.compact
    def __call__(self, inputs, shifts=None, train=False, sample=None):
        w = self.param("w", nn.initializers.normal(1.0), (1,))
        b = inputs.shape[0]
        noise = jax.random.uniform(self.make_rng("sample"), (b, self.num_neurons))
        return noise + w - jax.lax.stop_gradient(w)

    @staticmethod
    def regularizer(params: dict, reg_scale: float) -> jax.Array:
        return jnp.zeros(())
