"""Pretraining package: SSIM parity vs the torch reference implementation,
classification/reconstruction tasks, pretrained-core injection + freeze."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v1t_tpu.configs import Config
from v1t_tpu.pretrain.ssim import ssim
from v1t_tpu.pretrain.tasks import (
    ClassificationModel,
    ReconstructionModel,
    nll_loss,
)


def _torch_ssim(x, y):
    """Reference SSIM (reconstruction.py:47-155) re-run in torch as oracle."""
    import torch
    import torch.nn.functional as F

    def gaussian_kernel_1d(size, sigma):
        coords = torch.arange(size).float() - size // 2
        g = torch.exp(-(coords**2) / (2 * sigma**2))
        return (g / g.sum()).unsqueeze(0).unsqueeze(0)

    def gaussian_filter(inputs, win):
        channel = inputs.shape[1]
        outputs = inputs
        for i, s in enumerate(inputs.shape[2:]):
            if s >= win.shape[-1]:
                outputs = F.conv2d(
                    outputs, weight=win.transpose(2 + i, -1), stride=1,
                    padding=0, groups=channel,
                )
        return outputs

    x, y = torch.from_numpy(x), torch.from_numpy(y)
    win = gaussian_kernel_1d(11, 1.5)
    win = win.repeat([x.shape[1]] + [1] * (len(x.shape) - 1))
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu1, mu2 = gaussian_filter(x, win), gaussian_filter(y, win)
    s1 = gaussian_filter(x * x, win) - mu1**2
    s2 = gaussian_filter(y * y, win) - mu2**2
    s12 = gaussian_filter(x * y, win) - mu1 * mu2
    cs = (2 * s12 + C2) / (s1 + s2 + C2)
    m = ((2 * mu1 * mu2 + C1) / (mu1**2 + mu2**2 + C1)) * cs
    return m.flatten(2).mean(-1).squeeze(-1).mean().item()


def test_ssim_matches_torch_reference():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, size=(3, 1, 36, 64)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 20, x.shape), 0, 255).astype(np.float32)
    ours = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    theirs = _torch_ssim(x, y)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)
    # identity -> 1
    np.testing.assert_allclose(float(ssim(jnp.asarray(x), jnp.asarray(x))), 1.0,
                               atol=1e-5)


def _tiny_cfg():
    return Config(
        core="vit", behavior_mode=0, num_blocks=2, emb_dim=16, num_heads=2,
        mlp_dim=32, patch_size=8, patch_stride=8, precision="fp32",
        p_dropout=0.0, t_dropout=0.0,
    )


@pytest.mark.slow
def test_classification_model():
    model = ClassificationModel(
        config=_tiny_cfg(), image_shape=(1, 36, 64), num_classes=10
    )
    key = jax.random.key(0)
    x = jax.random.normal(key, (4, 1, 36, 64))
    variables = model.init({"params": key}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (4, 10)
    # log-softmax: rows sum to 1 in prob space
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(1), 1.0, rtol=1e-5)
    labels = jnp.asarray([1, 2, 3, 4])
    loss = nll_loss(out, labels)
    assert float(loss) > 0


def test_reconstruction_model():
    model = ReconstructionModel(config=_tiny_cfg(), image_shape=(1, 36, 64))
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 1, 36, 64))
    variables = model.init({"params": key}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 1, 36, 64)


@pytest.mark.slow
def test_pretrain_core_injection(tmp_path):
    """A pretrain checkpoint's core must load into the full model and freeze
    (reference models/utils.py:14-30, model.py:183-185)."""
    from v1t_tpu.data.cards import synthetic_data_card
    from v1t_tpu.models import build_model
    from v1t_tpu.models.model import init_model
    from v1t_tpu.pretrained import load_pretrain_core
    from v1t_tpu.utils.scheduler import Scheduler

    cfg = _tiny_cfg()
    cfg.readout = "gaussian2d"
    cfg.shift_mode = 0
    pre_dir = tmp_path / "pre"
    cfg_pre = Config(**{**cfg.to_dict(), "output_dir": str(pre_dir)})

    # pretrain model checkpoint with a 'core' subtree
    model_pre = ClassificationModel(
        config=cfg_pre, image_shape=(1, 16, 24), num_classes=5
    )
    key = jax.random.key(1)
    x = jax.random.normal(key, (2, 1, 16, 24))
    pre_params = dict(model_pre.init({"params": key}, x, train=False))["params"]
    sched = Scheduler(cfg_pre, save_optimizer=False)
    sched.save_checkpoint(0.5, 1, pre_params)

    # downstream model with the same core shape
    card = synthetic_data_card(mouse_ids=("A",), num_neurons=20,
                               input_shape=(1, 16, 24))
    cfg_down = Config(**{**cfg.to_dict(), "output_dir": str(tmp_path / "down"),
                         "pretrain_core": str(pre_dir), "resize_image": 0})
    model = build_model(cfg_down, card)
    params = init_model(model, seed=0)
    new_params = load_pretrain_core(cfg_down, params)
    # core params replaced with the pretrained ones
    for a, b in zip(
        jax.tree_util.tree_leaves(new_params["core"]),
        jax.tree_util.tree_leaves(pre_params["core"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
