"""Gaussian2d readout — per-neuron Gaussian grid locations over the core
feature map, sampled bilinearly (the flagship readout).

Capability parity with reference src/v1t/models/readout/gaussian2d.py:
- grid shape (1, N, 1, 2); mu either a free parameter
  (``disable_grid_predictor``) or predicted from anatomical coordinates via a
  Linear(2or3->30) -> ELU -> Linear(30->2) -> Tanh MLP over the
  centered/max-normalized source grid (gaussian2d.py:102-136, 188-193).
- sigma: "full" 2x2 per neuron (init U(-0.1, 0.1)), or uncorrelated /
  isotropic (fill 0.1) (gaussian2d.py:62-74, 179-182).
- sample_grid: mu clamped to [-1, 1]; eps ~ N(0, 1) per (batch, neuron)
  during training, zeros at eval; grid = clamp(sigma @ eps + mu, -1, 1)
  (gaussian2d.py:195-235).
- forward: optional CoreShifter shift, bilinear align_corners=True
  grid_sample, per-neuron feature weights over channels, bias init from
  response statistics (gaussian2d.py:237-278, 153-169).
- regularizer: reg_scale * sum|features| only (gaussian2d.py:83-100).

TPU-native: grid_sample lowers to masked XLA gathers
(v1t_tpu/ops/grid_sample.py); per-(batch, neuron) sampling noise threads an
explicit 'sample' PRNG stream.
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from v1t_tpu.data.cards import NeuronCard
from v1t_tpu.models.registry import register_readout
from v1t_tpu.ops.common import l1_sum
from v1t_tpu.ops.grid_sample import grid_sample_tokens
from v1t_tpu.ops.interp_matmul import MAX_TABLE_ROWS, interp_matmul_sample_cm


def _straight_through_clamp(x: jax.Array, lo: float, hi: float) -> jax.Array:
    """Clamp values while letting gradients pass unclamped — the functional
    equivalent of the reference's in-place no_grad mu.clamp_
    (gaussian2d.py:212-215)."""
    return x + jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x)


@register_readout("gaussian2d")
class Gaussian2DReadout(nn.Module):
    input_shape: t.Tuple[int, int, int]  # core output (C, h, w)
    neuron_card: NeuronCard
    use_grid_predictor: bool = True
    grid_predictor_dim: int = 2
    bias_mode: int = 0
    use_bias: bool = True
    init_mu_range: float = 0.3
    init_sigma: float = 0.1
    gaussian_type: str = "full"
    dtype: t.Any = None
    # bilinear sampling implementation: "auto" picks the MXU interp-matmul
    # kernel on TPU for bf16 compute (ops/interp_matmul.py) and the exact
    # XLA gather path otherwise; "xla" / "pallas" force one
    impl: str = "auto"

    @property
    def num_neurons(self) -> int:
        return self.neuron_card.num_neurons

    def setup(self):
        if not (0.0 < self.init_mu_range <= 1.0) or self.init_sigma <= 0:
            raise ValueError(
                "either init_mu_range doesn't belong to [0.0, 1.0] or "
                "init_sigma_range is non-positive"
            )
        n = self.num_neurons
        if self.gaussian_type == "full":
            sigma_shape = (1, n, 2, 2)
            sigma_init = lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -self.init_sigma, self.init_sigma
            )
        elif self.gaussian_type == "uncorrelated":
            sigma_shape = (1, n, 1, 2)
            sigma_init = nn.initializers.constant(self.init_sigma)
        elif self.gaussian_type == "isotropic":
            sigma_shape = (1, n, 1, 1)
            sigma_init = nn.initializers.constant(self.init_sigma)
        else:
            raise ValueError(f"Unknown Gaussian type {self.gaussian_type}.")
        self.sigma = self.param("sigma", sigma_init, sigma_shape)

        c = self.input_shape[0]
        self.features = self.param(
            "features", nn.initializers.constant(1.0 / c), (1, c, 1, n)
        )

        if self.use_bias:
            stats_mean = np.asarray(self.neuron_card.response_mean, np.float32)
            stats_std = np.asarray(self.neuron_card.response_std, np.float32)
            if self.bias_mode == 0:
                bias_value = np.zeros(n, np.float32)
            elif self.bias_mode == 1:
                bias_value = stats_mean
            elif self.bias_mode == 2:
                bias_value = stats_mean / stats_std
            else:
                raise NotImplementedError(
                    f"Gaussian2dReadout: bias mode {self.bias_mode} has not "
                    "been implemented."
                )
            self.bias = self.param(
                "bias", lambda key, shape: jnp.asarray(bias_value), (n,)
            )

        if self.use_grid_predictor:
            # centered / max-normalized anatomical coordinates
            # (gaussian2d.py:133-135)
            source = np.asarray(
                self.neuron_card.coordinates[:, : self.grid_predictor_dim],
                np.float32,
            )
            source = source - source.mean(axis=0, keepdims=True)
            source = source / np.abs(source).max()
            self.source_grid = jnp.asarray(source)  # (N, dim) constant buffer
            # torch default Linear init (the reference's mu_transform
            # Sequential sets no custom init, gaussian2d.py:130-136)
            from v1t_tpu.ops.common import (
                torch_default_bias_init,
                torch_default_kernel_init,
            )

            self.mu_fc1 = nn.Dense(
                30,
                kernel_init=torch_default_kernel_init,
                bias_init=torch_default_bias_init(source.shape[1]),
                name="mu_fc1",
            )
            self.mu_fc2 = nn.Dense(
                2,
                kernel_init=torch_default_kernel_init,
                bias_init=torch_default_bias_init(30),
                name="mu_fc2",
            )
        else:
            self._mu = self.param(
                "_mu",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -self.init_mu_range, self.init_mu_range
                ),
                (1, n, 1, 2),
            )

    def mu(self) -> jax.Array:
        """(1, N, 1, 2) grid means in [-1, 1]."""
        if self.use_grid_predictor:
            x = self.mu_fc1(self.source_grid)
            x = jax.nn.elu(x)
            x = jnp.tanh(self.mu_fc2(x))
            return x.reshape(1, self.num_neurons, 1, 2)
        return _straight_through_clamp(self._mu, -1.0, 1.0)

    def sample_grid(
        self,
        batch_size: int,
        sample: bool,
        rng: t.Optional[jax.Array],
    ) -> jax.Array:
        """Per-(batch, neuron) grid locations: N(mu, sigma) during training,
        mu at eval (gaussian2d.py:195-235)."""
        mu = self.mu()
        grid_shape = (batch_size, self.num_neurons, 1, 2)
        if sample:
            norm = jax.random.normal(rng, grid_shape, jnp.float32)
        else:
            norm = jnp.zeros(grid_shape, jnp.float32)
        if self.gaussian_type != "full":
            grid = norm * self.sigma + mu
        else:
            # out[b,n,i,c] = sum_d sigma[0,n,c,d] * norm[b,n,i,d]
            grid = jnp.einsum("ancd,bnid->bnic", self.sigma, norm) + mu
        return jnp.clip(grid, -1.0, 1.0)

    def __call__(
        self,
        inputs: jax.Array,
        shifts: t.Optional[jax.Array] = None,
        train: bool = False,
        sample: t.Optional[bool] = None,
    ) -> jax.Array:
        """inputs: (B, C, h, w) core output -> (B, N) responses (pre-ELU1)."""
        batch_size, c, h, w = inputs.shape
        sample = train if sample is None else sample
        rng = self.make_rng("sample") if sample else None
        grid = self.sample_grid(batch_size=batch_size, sample=sample, rng=rng)
        if shifts is not None:
            grid = grid + shifts[:, None, None, :]
        grid = grid.reshape(batch_size, self.num_neurons, 2)
        from v1t_tpu.ops.common import interpret_enabled

        use_pallas = self.impl == "pallas" or (
            self.impl == "auto"
            and inputs.dtype == jnp.bfloat16
            and (jax.default_backend() == "tpu" or interpret_enabled())
            # full-resolution feature maps (34k tokens) exceed the kernel's
            # VMEM-resident table cap -> exact XLA gather path
            and h * w <= MAX_TABLE_ROWS
        )
        if use_pallas:
            # channel-major: the kernel consumes the core's (B, C, h*w)
            # layout directly (no transpose) and its matmuls put C in the
            # MXU's sublane-padded M dimension (155 -> 160 rows instead of
            # 155 -> 256 lanes)
            flat_cm = inputs.reshape(batch_size, c, h * w)
            sampled_cm = interp_matmul_sample_cm(
                flat_cm, grid, height=h, width=w
            )  # (B, C, N)
            outputs = jnp.sum(
                sampled_cm * self.features.reshape(1, c, self.num_neurons),
                axis=1,
            )  # (B, N)
        else:
            # token-major sampling: the transpose cancels against the core's
            # (b n c) -> (b c h w) output rearrange, so neither materializes
            flat = inputs.reshape(batch_size, c, h * w).transpose(0, 2, 1)
            sampled = grid_sample_tokens(
                flat, grid, height=h, width=w, mode="bilinear"
            )  # (B, N, C)
            features = jnp.transpose(
                self.features.reshape(c, self.num_neurons)
            )  # (N, C)
            outputs = jnp.sum(sampled * features[None], axis=2)  # (B, N)
        if self.use_bias:
            outputs = outputs + self.bias
        return outputs

    @staticmethod
    def regularizer(params: dict, reg_scale: float) -> jax.Array:
        """L1 on the feature weights only (gaussian2d.py:83-100)."""
        return reg_scale * l1_sum(params["features"])
