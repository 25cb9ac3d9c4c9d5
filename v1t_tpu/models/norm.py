"""BatchNorm with torch's running-statistics semantics.

flax ``nn.BatchNorm`` differs from ``torch.nn.BatchNorm2d`` in two ways that
matter for reference parity (reference stacked2d.py:445-472 and stn.py both
use torch defaults):

1. torch updates ``running_var`` with the UNBIASED batch variance
   (``n/(n-1)`` correction) while normalizing with the biased one; flax uses
   the biased variance for both.
2. the momentum conventions are inverted: torch's ``momentum`` is the weight
   of the NEW batch statistic (``ra = (1-m) * ra + m * batch``), flax's is
   the weight of the OLD running value. The reference passes torch
   ``momentum=0.9`` for stacked2d (reference stacked2d.py:335,449 — only 10%
   of the old value survives each step) and the torch default 0.1 for stn —
   silently translating through flax's convention is exactly the kind of bug
   this module exists to prevent, so ``TorchBatchNorm.momentum`` uses the
   TORCH convention verbatim.

``TorchBatchNorm`` keeps flax's variable layout (``batch_stats``:
``mean``/``var``; params: ``scale``/``bias``) so checkpoint and transplant
mappings are unchanged, but reproduces torch's update rule exactly
(pinned by tests/test_reference_parity.py BN-dynamics cases).
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = t.Any


class TorchBatchNorm(nn.Module):
    """BatchNorm over the trailing feature axis (NHWC inputs).

    ``momentum`` follows the TORCH convention (weight of the new batch
    statistic); the default matches ``torch.nn.BatchNorm2d``.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    use_bias: bool = True
    use_scale: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        x32 = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(x32, axis=reduce_axes)
            # biased variance normalizes the batch (torch semantics) ...
            var = jnp.mean(
                jnp.square(x32 - mean.reshape((1,) * (x.ndim - 1) + (-1,))),
                axis=reduce_axes,
            )
            if not self.is_initializing():
                n = 1
                for ax in reduce_axes:
                    n *= x.shape[ax]
                # ... while the running update uses the UNBIASED one
                # (torch _BatchNorm.forward; n/(n-1) correction)
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum  # torch convention: weight of the batch
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased

        shape = (1,) * (x.ndim - 1) + (-1,)
        y = (x32 - mean.reshape(shape)) * jax.lax.rsqrt(
            var.reshape(shape) + self.epsilon
        )
        if self.use_scale:
            scale = self.param(
                "scale", nn.initializers.ones, (features,), jnp.float32
            )
            y = y * scale.reshape(shape)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (features,), jnp.float32
            )
            y = y + bias.reshape(shape)
        return y.astype(self.dtype or x.dtype)
