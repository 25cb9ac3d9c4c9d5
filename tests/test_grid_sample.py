"""grid_sample parity vs torch.nn.functional.grid_sample — the reference's
exact semantics (align_corners=True, zero padding) that the Gaussian2d
readout and ImageCropper depend on (SURVEY.md §7 "hard parts" #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from v1t_tpu.ops import grid_sample, resize_bilinear


def _rand(shape, seed, low=-1.0, high=1.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(low, high, size=shape).astype(np.float32)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize(
    "in_shape,grid_shape",
    [
        ((2, 3, 8, 10), (2, 5, 7, 2)),
        ((1, 155, 29, 57), (1, 200, 1, 2)),  # readout-style point sampling
        ((3, 1, 144, 256), (3, 144, 256, 2)),  # cropper-style full mesh
    ],
)
def test_matches_torch_in_bounds_and_oob(mode, in_shape, grid_shape):
    x = _rand(in_shape, seed=0, low=-2, high=2)
    # grid extends past [-1, 1] to exercise the zero-padding path
    g = _rand(grid_shape, seed=1, low=-1.3, high=1.3)

    ours = grid_sample(jnp.asarray(x), jnp.asarray(g), mode=mode)
    theirs = F.grid_sample(
        torch.from_numpy(x),
        torch.from_numpy(g),
        mode=mode,
        padding_mode="zeros",
        align_corners=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-5
    )


def test_exact_corner_values():
    """grid (-1,-1) must return pixel [0,0]; (1,1) pixel [H-1,W-1]."""
    x = np.arange(12, dtype=np.float32).reshape(1, 1, 3, 4)
    g = np.array([[[[-1.0, -1.0]], [[1.0, 1.0]]]], dtype=np.float32)  # (1,2,1,2)
    out = grid_sample(jnp.asarray(x), jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(out).ravel(), [0.0, 11.0])


def test_gradients_match_torch():
    """Gradients w.r.t. both the input and the grid must match torch."""
    x = _rand((2, 4, 6, 6), seed=2)
    g = _rand((2, 3, 3, 2), seed=3, low=-1.2, high=1.2)

    def loss_j(x_, g_):
        return jnp.sum(grid_sample(x_, g_) ** 2)

    gx_j, gg_j = jax.grad(loss_j, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(g))

    xt = torch.from_numpy(x).requires_grad_(True)
    gt = torch.from_numpy(g).requires_grad_(True)
    loss_t = (
        F.grid_sample(xt, gt, mode="bilinear", padding_mode="zeros", align_corners=True)
        ** 2
    ).sum()
    loss_t.backward()

    np.testing.assert_allclose(np.asarray(gx_j), xt.grad.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg_j), gt.grad.numpy(), rtol=1e-4, atol=1e-4)


def test_resize_matches_torchvision():
    """Bilinear resize to (36, 64) must match torchvision Resize(antialias=False)
    — the cropper's resize path (reference image_cropper.py:96-99)."""
    x = _rand((2, 1, 144, 256), seed=4, low=0, high=1)
    ours = resize_bilinear(jnp.asarray(x), 36, 64)
    theirs = F.interpolate(
        torch.from_numpy(x), size=(36, 64), mode="bilinear", align_corners=False
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5)
