"""Shared compute primitives: activations, stochastic depth, patch extraction."""

from __future__ import annotations

import os as _os
import typing as t

import jax
import jax.numpy as jnp


def interpret_enabled() -> bool:
    """V1T_PALLAS_INTERPRET=1 runs every Pallas kernel under the Mosaic
    TPU interpreter (jax.experimental.pallas.tpu.InterpretParams) so the
    fused kernel paths execute on a CPU backend — including the 8-device
    virtual mesh the multi-chip tests use. Test-only: the interpreter is
    orders of magnitude slower than compiled Mosaic."""
    val = _os.environ.get("V1T_PALLAS_INTERPRET", "0").strip().lower()
    if val in ("", "0", "false", "auto"):
        return False
    if val in ("1", "true"):
        return True
    raise ValueError(f"V1T_PALLAS_INTERPRET={val!r} must be 0/1")


def pallas_call(*args, **kwargs):
    """``pl.pallas_call`` with the session's interpret mode applied — every
    kernel call site routes through here so V1T_PALLAS_INTERPRET covers all
    of them (read at trace time)."""
    from jax.experimental import pallas as pl

    if interpret_enabled():
        from jax.experimental.pallas import tpu as pltpu

        kwargs.setdefault("interpret", pltpu.InterpretParams())
    return pl.pallas_call(*args, **kwargs)


def torch_default_kernel_init(key, shape, dtype=jnp.float32):
    """torch's default nn.Linear / nn.Conv2d weight init:
    kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +1/sqrt(fan_in)).
    Works for Dense kernels (fan_in, fan_out) and flax Conv kernels
    (kh, kw, in, out): fan_in = prod(shape[:-1]). The reference keeps torch
    defaults for every module OUTSIDE the transformer's trunc-normal init
    (shifters, mu-predictor, patch/readout Linears — e.g. nothing in
    src/v1t/models/image_cropper.py or readout/dense.py sets an init)."""
    fan_in = 1
    for s in shape[:-1]:
        fan_in *= s
    bound = fan_in ** -0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_bias_init(fan_in: int):
    """torch's default Linear/Conv bias init: U(+-1/sqrt(fan_in)). The bias
    shape doesn't carry fan_in, so it is bound at construction."""
    bound = fan_in ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def elu1(x: jax.Array) -> jax.Array:
    """ELU(x) + 1 — keeps predicted firing rates positive.

    Reference: src/v1t/models/utils.py:109-118.
    """
    return jax.nn.elu(x) + 1.0


def l1_sum(p: jax.Array) -> jax.Array:
    """sum(|p|) with torch's subgradient convention: d|x|/dx = 0 at x == 0.

    ``jax.grad(jnp.abs)(0.0) == 1.0`` while torch's ``abs`` backward yields
    0 at zero. L1-regularized modules here are routinely zero-initialized
    (LayerNorm/Linear biases), so the default JAX subgradient injects a
    constant ``reg_scale`` pull on every zero leaf that the reference
    (e.g. src/v1t/models/core/vit.py:419-421) does not have — enough to
    visibly alter early training dynamics under Adam. ``p * sign(p)`` has
    the same value and torch's gradient.
    """
    return jnp.sum(p * jnp.sign(jax.lax.stop_gradient(p)))


def drop_path(
    x: jax.Array,
    rate: float,
    deterministic: bool,
    rng: t.Optional[jax.Array],
) -> jax.Array:
    """Stochastic depth: drop whole residual branches per sample.

    Reference: src/v1t/models/utils.py:121-141 — Bernoulli(keep) mask on the
    batch axis, output scaled by 1/keep.
    """
    if rate == 0.0 or deterministic:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, p=keep, shape=shape)
    return jnp.where(mask, x / keep, jnp.zeros((), x.dtype))


def unfold_patches(images: jax.Array, patch_size: int, stride: int) -> jax.Array:
    """Extract (patch_size x patch_size) patches with stride, flattened per
    patch — the JAX equivalent of ``nn.Unfold`` + ``Rearrange('b c l -> b l c')``
    in the reference tokenizer (src/v1t/models/core/vit.py:67-71).

    Args:
        images: (B, C, H, W).
    Returns:
        (B, L, C * patch_size * patch_size) where
        L = floor((H - p)/s + 1) * floor((W - p)/s + 1); the feature axis is
        ordered channel-major (c, ph, pw), matching torch's Unfold.
    """
    b = images.shape[0]
    # conv_general_dilated_patches returns (B, C*p*p, H', W') with the feature
    # dim ordered (c, ph, pw) — the same channel-major order as nn.Unfold.
    patches = jax.lax.conv_general_dilated_patches(
        images,
        filter_shape=(patch_size, patch_size),
        window_strides=(stride, stride),
        padding="VALID",
    )
    d = patches.shape[1]
    patches = patches.reshape(b, d, -1)  # (B, C*p*p, L)
    return jnp.swapaxes(patches, 1, 2)  # (B, L, C*p*p)


def find_shape(num_patches: int) -> t.Tuple[int, int]:
    """Largest factor pair (h, w) with h <= sqrt(n) — the reference's latent
    feature-map factorization (src/v1t/models/core/vit.py:411-417);
    1653 -> (29, 57)."""
    import math

    dim1 = math.ceil(math.sqrt(num_patches))
    while num_patches % dim1 != 0 and dim1 > 0:
        dim1 -= 1
    return dim1, num_patches // dim1


def unfold_output_size(size: int, patch_size: int, stride: int, padding: int = 0) -> int:
    return (size + 2 * padding - patch_size) // stride + 1
