"""Per-mouse core/readout shifters: pupil center -> (dx, dy) readout-grid
shift, applied inside the Gaussian2d readout.

Parity with reference src/v1t/models/core_shifter.py: an MLP
2 -> 5 -> 5 -> 2 with Tanh after every layer, one per mouse; L1 regularizer
scaled by shifter_reg_scale.
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn


class CoreShifter(nn.Module):
    hidden_features: int = 5
    num_layers: int = 3
    dtype: t.Any = None

    @nn.compact
    def __call__(self, pupil_centers: jax.Array) -> jax.Array:
        # torch default Linear init (reference core_shifter.py sets none)
        from v1t_tpu.ops.common import (
            torch_default_bias_init,
            torch_default_kernel_init,
        )

        x = pupil_centers
        for i in range(self.num_layers - 1):
            x = nn.Dense(
                self.hidden_features, dtype=self.dtype,
                kernel_init=torch_default_kernel_init,
                bias_init=torch_default_bias_init(x.shape[-1]),
                name=f"fc{i}",
            )(x)
            x = jnp.tanh(x)
        x = nn.Dense(
            2, dtype=self.dtype,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(x.shape[-1]),
            name=f"fc{self.num_layers - 1}",
        )(x)
        return jnp.tanh(x)


class CoreShifters(nn.Module):
    mouse_ids: t.Tuple[str, ...]
    hidden_features: int = 5
    num_layers: int = 3
    dtype: t.Any = None

    def setup(self):
        self.shifters = {
            mouse_id: CoreShifter(
                hidden_features=self.hidden_features,
                num_layers=self.num_layers,
                dtype=self.dtype,
                name=f"shifter_{mouse_id}",
            )
            for mouse_id in self.mouse_ids
        }

    def __call__(self, pupil_centers: jax.Array, mouse_id: str) -> jax.Array:
        return self.shifters[mouse_id](pupil_centers)

    @staticmethod
    def regularizer(params: dict, mouse_id: str, reg_scale: float) -> jax.Array:
        key = f"shifter_{mouse_id}"
        if key not in params:
            return jnp.zeros(())
        leaves = jax.tree_util.tree_leaves(params[key])
        from v1t_tpu.ops.common import l1_sum

        return reg_scale * sum(l1_sum(p) for p in leaves)
