"""torch-default initialization parity: the reference applies custom init
only inside the transformer (trunc_normal, vit.py:338-346) and to specific
convs (kaiming_normal_); every other Linear/Conv keeps torch's default
kaiming_uniform(a=sqrt(5)) weights + U(+-1/sqrt(fan_in)) bias. These tests
pin that contract for the JAX rebuild."""

import jax
import jax.numpy as jnp
import numpy as np

from v1t_tpu.ops.common import torch_default_bias_init, torch_default_kernel_init


def test_kernel_init_bounds_and_spread():
    key = jax.random.key(0)
    w = torch_default_kernel_init(key, (64, 128))
    bound = 64 ** -0.5
    w = np.asarray(w)
    assert np.all(np.abs(w) <= bound)
    # uniform over (-b, b): std = b/sqrt(3)
    assert abs(w.std() - bound / np.sqrt(3)) < 0.01 * bound


def test_conv_kernel_fan_in():
    key = jax.random.key(1)
    w = np.asarray(torch_default_kernel_init(key, (3, 3, 8, 16)))
    bound = (3 * 3 * 8) ** -0.5
    assert np.all(np.abs(w) <= bound)


def test_bias_init_bound():
    init = torch_default_bias_init(49)
    b = np.asarray(init(jax.random.key(2), (16,)))
    assert np.all(np.abs(b) <= 49 ** -0.5)
    assert b.std() > 0  # not zeros


def test_patch_projection_uses_torch_default():
    """Image2Patches' Linear projection keeps torch defaults (the reference
    inits only Conv2d there, vit.py:118-120) — NOT the transformer's
    trunc_normal."""
    from v1t_tpu.models.cores.vit import Image2Patches

    mod = Image2Patches(
        image_shape=(1, 16, 24), patch_mode=0, patch_size=8, stride=4,
        emb_dim=32,
    )
    params = mod.init(jax.random.key(0), jnp.zeros((1, 1, 16, 24)))["params"]
    w = np.asarray(params["projection"]["kernel"])
    bound = 64 ** -0.5  # fan_in = 1 * 8 * 8
    assert np.all(np.abs(w) <= bound + 1e-7)
    b = np.asarray(params["projection"]["bias"])
    assert np.all(np.abs(b) <= bound + 1e-7) and b.std() > 0


def test_shifter_mlps_use_torch_default():
    from v1t_tpu.models.shifter import CoreShifter

    params = CoreShifter().init(jax.random.key(0), jnp.zeros((1, 2)))["params"]
    w0 = np.asarray(params["fc0"]["kernel"])
    assert np.all(np.abs(w0) <= 2 ** -0.5 + 1e-7)
    assert np.asarray(params["fc0"]["bias"]).std() > 0
