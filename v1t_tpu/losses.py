"""Training criteria: Poisson (default), MSSE, correlation.

Semantics match the reference exactly (src/v1t/losses.py):
- ``msse``: sum over neurons of squared error, then sum/mean over batch
  (losses.py:25-29).
- ``poisson_loss``: sum(y_pred - y_true * log(y_pred + eps)) (losses.py:32-40);
  the PoissonLoss criterion adds float32-eps to BOTH targets and predictions
  before the log (losses.py:162-164).
- ``correlation``: standardize both arrays with the biased std + 1e-8 eps,
  then mean of the product (losses.py:43-89). JAX and numpy twins provided,
  like the torch/numpy twins in the reference.
- dataset scaling: loss * sqrt(len(dataset)/batch_size) per mouse when
  ``ds_scale`` (losses.py:114-119).
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
import numpy as np

EPS = float(np.finfo(np.float32).eps)

_CRITERION: t.Dict[str, type] = {}


def register(name: str):
    def add_to_dict(cls):
        _CRITERION[name] = cls
        return cls

    return add_to_dict


def msse(y_true: jax.Array, y_pred: jax.Array, reduction: str = "sum") -> jax.Array:
    """Mean sum squared error: sum over neurons, reduce over batch."""
    loss = jnp.sum(jnp.square(y_true - y_pred), axis=-1)
    return jnp.sum(loss) if reduction == "sum" else jnp.mean(loss)


def poisson_loss(
    y_true: jax.Array,
    y_pred: jax.Array,
    eps: float = 1e-12,
    reduction: str = "sum",
) -> jax.Array:
    loss = y_pred - y_true * jnp.log(y_pred + eps)
    loss = jnp.sum(loss, axis=-1)
    return jnp.sum(loss) if reduction == "sum" else jnp.mean(loss)


def _j_correlation(y1, y2, axis=-1, eps=1e-8):
    y1 = (y1 - y1.mean(axis=axis, keepdims=True)) / (
        y1.std(axis=axis, keepdims=True) + eps
    )
    y2 = (y2 - y2.mean(axis=axis, keepdims=True)) / (
        y2.std(axis=axis, keepdims=True) + eps
    )
    return (y1 * y2).mean(axis=axis)


def _np_correlation(y1, y2, axis=-1, eps=1e-8, **kwargs):
    y1 = (y1 - y1.mean(axis=axis, keepdims=True)) / (
        y1.std(axis=axis, ddof=0, keepdims=True) + eps
    )
    y2 = (y2 - y2.mean(axis=axis, keepdims=True)) / (
        y2.std(axis=axis, ddof=0, keepdims=True) + eps
    )
    return (y1 * y2).mean(axis=axis, **kwargs)


def correlation(y1, y2, dim=-1, eps=1e-8, **kwargs):
    """Pearson correlation along ``dim`` (biased std). Accepts JAX arrays or
    numpy arrays; numpy in -> numpy out."""
    if isinstance(y1, np.ndarray):
        return _np_correlation(y1, y2, axis=dim, eps=eps, **kwargs)
    return _j_correlation(y1, y2, axis=dim, eps=eps)


class Loss:
    """Base criterion with per-mouse dataset-size loss scaling.

    All criteria accept an optional ``mask`` — per-sample 0/1 weights over
    the batch axis — so padded (shape-stable) batches under jit compute the
    exact loss of the un-padded batch. With mask=None the semantics are
    bit-identical to the reference.
    """

    def __init__(self, config, ds_sizes: t.Dict[str, int]):
        self.ds_scale = bool(config.ds_scale)
        self.ds_sizes = {k: float(v) for k, v in ds_sizes.items()}

    def scale_ds(self, loss: jax.Array, mouse_id: str, batch_size) -> jax.Array:
        if self.ds_scale:
            scale = jnp.sqrt(self.ds_sizes[mouse_id] / batch_size)
            loss = scale * loss
        return loss

    def __call__(self, y_true, y_pred, mouse_id: str, batch_size=None, mask=None):
        raise NotImplementedError


def _masked_sum(per_sample: jax.Array, mask) -> jax.Array:
    """Sum per-sample losses, weighting by the optional batch mask."""
    if mask is None:
        return jnp.sum(per_sample)
    return jnp.sum(per_sample * mask)


def _batch_size(y_true, batch_size, mask):
    if batch_size is not None:
        return batch_size
    if mask is not None:
        return jnp.sum(mask)
    return y_true.shape[0]


@register("msse")
class MSSE(Loss):
    def __call__(self, y_true, y_pred, mouse_id: str, batch_size=None, mask=None):
        batch_size = _batch_size(y_true, batch_size, mask)
        per_sample = jnp.sum(jnp.square(y_true - y_pred), axis=-1)
        loss = _masked_sum(per_sample, mask)
        return self.scale_ds(loss, mouse_id=mouse_id, batch_size=batch_size)


@register("poisson")
class PoissonLoss(Loss):
    def __init__(self, config, ds_sizes, eps: float = EPS):
        super().__init__(config, ds_sizes)
        self.eps = eps

    def __call__(self, y_true, y_pred, mouse_id: str, batch_size=None, mask=None):
        batch_size = _batch_size(y_true, batch_size, mask)
        y_true = y_true + self.eps
        y_pred = y_pred + self.eps
        per_sample = jnp.sum(y_pred - y_true * jnp.log(y_pred), axis=-1)
        loss = _masked_sum(per_sample, mask)
        return self.scale_ds(loss, mouse_id=mouse_id, batch_size=batch_size)


@register("correlation")
class Correlation(Loss):
    """num_neurons - sum of per-neuron correlations over the batch axis."""

    def __init__(self, config, ds_sizes, eps: float = EPS):
        super().__init__(config, ds_sizes)
        self.eps = eps

    def __call__(self, y_true, y_pred, mouse_id: str, batch_size=None, mask=None):
        batch_size = _batch_size(y_true, batch_size, mask)
        num_neurons = y_true.shape[1]
        if mask is None:
            corr = correlation(y1=y_true, y2=y_pred, dim=0, eps=self.eps)
        else:
            w = mask[:, None] / jnp.sum(mask)

            def standardize(y):
                mean = jnp.sum(y * w, axis=0, keepdims=True)
                var = jnp.sum(w * jnp.square(y - mean), axis=0, keepdims=True)
                return (y - mean) / (jnp.sqrt(var) + self.eps)

            corr = jnp.sum(standardize(y_true) * standardize(y_pred) * w, axis=0)
        loss = num_neurons - jnp.sum(corr)
        return self.scale_ds(loss, mouse_id=mouse_id, batch_size=batch_size)


def get_criterion(config, ds_sizes: t.Dict[str, int]) -> Loss:
    """Resolve the criterion by name (reference losses.py:193-197).

    Args:
        ds_sizes: mouse_id -> number of training trials for that mouse.
    """
    assert config.criterion in _CRITERION, f"Criterion {config.criterion} not found."
    return _CRITERION[config.criterion](config, ds_sizes)
