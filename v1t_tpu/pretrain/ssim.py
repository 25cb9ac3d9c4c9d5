"""Separable-Gaussian SSIM in JAX (reference
src/v1t/pretrain/reconstruction.py:47-155; itself after
VainF/pytorch-msssim). Used as the 1-SSIM reconstruction pretraining loss."""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp


def _gaussian_kernel_1d(size: int, sigma: float) -> jax.Array:
    coords = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(coords**2) / (2 * sigma**2))
    return (g / g.sum()).reshape(1, 1, size)


def _gaussian_filter(inputs: jax.Array, win: jax.Array) -> jax.Array:
    """Separable blur: apply the 1-D kernel along H then W (valid padding),
    grouped per channel (reference reconstruction.py:62-82)."""
    channels = inputs.shape[1]
    outputs = inputs
    size = win.shape[-1]
    for axis, s in enumerate(inputs.shape[2:]):
        if s >= size:
            if axis == 0:
                kern = win.reshape(1, 1, size, 1)
            else:
                kern = win.reshape(1, 1, 1, size)
            kern = jnp.tile(kern, (channels, 1, 1, 1))
            outputs = jax.lax.conv_general_dilated(
                outputs,
                kern,
                window_strides=(1, 1),
                padding="VALID",
                feature_group_count=channels,
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
    return outputs


def ssim(
    x: jax.Array,
    y: jax.Array,
    max_value: float = 255.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    reduction: t.Optional[str] = "mean",
) -> jax.Array:
    """Structural similarity of (N, C, H, W) image batches."""
    assert x.shape == y.shape
    assert x.ndim == 4
    assert win_size % 2 == 1

    win = _gaussian_kernel_1d(win_size, win_sigma)
    c1 = (k1 * max_value) ** 2
    c2 = (k2 * max_value) ** 2

    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mu1 = _gaussian_filter(x, win)
    mu2 = _gaussian_filter(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = _gaussian_filter(x * x, win) - mu1_sq
    sigma2_sq = _gaussian_filter(y * y, win) - mu2_sq
    sigma12 = _gaussian_filter(x * y, win) - mu1_mu2

    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map

    scores = ssim_map.reshape(*ssim_map.shape[:2], -1).mean(axis=-1)
    scores = scores.squeeze(axis=-1)  # grayscale: one channel

    if reduction == "sum":
        return scores.sum()
    if reduction == "mean":
        return scores.mean()
    return scores


def reconstruction_loss(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """1 - SSIM on de-standardized images (reference
    reconstruction.py:158-162)."""
    from v1t_tpu.pretrain.data import IMAGE_MEAN, IMAGE_STD

    y_true = y_true * IMAGE_STD + IMAGE_MEAN
    y_pred = y_pred * IMAGE_STD + IMAGE_MEAN
    return 1.0 - ssim(y_true, y_pred, reduction="mean")
