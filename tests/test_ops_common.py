"""Tests for unfold/drop_path/elu1/find_shape against torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from v1t_tpu.ops import elu1, drop_path, unfold_patches
from v1t_tpu.ops.common import find_shape, unfold_output_size


def test_unfold_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 12, 16)).astype(np.float32)
    ours = unfold_patches(jnp.asarray(x), patch_size=4, stride=2)
    theirs = torch.nn.functional.unfold(
        torch.from_numpy(x), kernel_size=4, stride=2
    ).transpose(1, 2)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-6, atol=1e-6)


def test_unfold_patch_count_vit_default():
    """Default V1T config: 36x64 input, patch 8, stride 1 -> 29*57 = 1653
    patches (reference vit.py:112-115)."""
    assert unfold_output_size(36, 8, 1) * unfold_output_size(64, 8, 1) == 1653
    x = jnp.zeros((1, 1, 36, 64))
    assert unfold_patches(x, 8, 1).shape == (1, 1653, 64)


def test_find_shape():
    assert find_shape(1653) == (29, 57)
    assert find_shape(16) == (4, 4)
    assert find_shape(30) == (6, 5)


def test_elu1_positive_and_matches_torch():
    x = np.linspace(-5, 5, 101).astype(np.float32)
    ours = np.asarray(elu1(jnp.asarray(x)))
    theirs = (torch.nn.functional.elu(torch.from_numpy(x)) + 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)
    assert (ours > 0).all()


def test_drop_path_statistics():
    x = jnp.ones((4096, 3))
    rate = 0.3
    out = drop_path(x, rate=rate, deterministic=False, rng=jax.random.key(0))
    out = np.asarray(out)
    # each sample either zeroed or scaled by 1/keep
    keep = 1 - rate
    rows = out[:, 0]
    uniq = np.unique(rows)
    assert all(min(abs(u - 0.0), abs(u - 1 / keep)) < 1e-5 for u in uniq)
    # expectation preserved
    np.testing.assert_allclose(rows.mean(), 1.0, atol=0.05)
    # deterministic mode is identity
    np.testing.assert_array_equal(
        np.asarray(drop_path(x, rate, deterministic=True, rng=None)), np.asarray(x)
    )
