"""Data-parallel mesh tests on the 8-virtual-device CPU mesh: sharded
training must produce the same losses/params as single-device training
(gradient all-reduce over the mesh is exact because losses are sums)."""

import jax
import numpy as np
import pytest

from v1t_tpu import training
from v1t_tpu.configs import Config
from v1t_tpu.data.cards import synthetic_data_card
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model
from v1t_tpu.parallel.mesh import DataParallel


def _setup(mesh=None, batch_size=16):
    cfg = Config(
        core="vit", readout="gaussian2d", behavior_mode=3, shift_mode=2,
        batch_size=batch_size, num_blocks=2, emb_dim=16, num_heads=2,
        mlp_dim=32, patch_size=8, patch_stride=8, precision="fp32",
        p_dropout=0.0, t_dropout=0.0, resize_image=0,
        core_reg_scale=0.1, readout_reg_scale=0.01, lr=1e-3, seed=7,
    )
    card = synthetic_data_card(
        mouse_ids=("A",), num_neurons=40, input_shape=(1, 16, 24), ds_size=64
    )
    model = build_model(cfg, card)
    params = init_model(model, seed=0)
    trainer = training.Trainer(cfg, model, params, card, mesh=mesh)
    return cfg, trainer


def _batch(batch_size=16):
    rng = np.random.default_rng(3)
    return {
        "image": rng.normal(size=(batch_size, 1, 16, 24)).astype(np.float32),
        "response": rng.poisson(2.0, (batch_size, 40)).astype(np.float32),
        "behavior": rng.normal(size=(batch_size, 3)).astype(np.float32),
        "pupil_center": rng.normal(size=(batch_size, 2)).astype(np.float32),
    }


def test_mesh_creation():
    assert jax.device_count() == 8
    mesh = DataParallel.create()
    assert mesh is not None and mesh.num_devices == 8
    assert DataParallel.create(num_devices=1) is None


def test_dp_matches_single_device():
    batch = _batch()
    _, t_single = _setup(mesh=None)
    _, t_dp = _setup(mesh=DataParallel.create())

    # identical initial params
    for a, b in zip(
        jax.tree_util.tree_leaves(t_single.params),
        jax.tree_util.tree_leaves(t_dp.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    for step in range(3):
        _, m_single = t_single.train_step("A", batch, acc_grads=None, update=True)
        _, m_dp = t_dp.train_step("A", batch, acc_grads=None, update=True)
        np.testing.assert_allclose(
            m_single["loss/total_loss"], m_dp["loss/total_loss"], rtol=1e-4
        )

    for a, b in zip(
        jax.tree_util.tree_leaves(t_single.params),
        jax.tree_util.tree_leaves(t_dp.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_dp_batch_sharding_layout():
    mesh = DataParallel.create()
    batch = _batch()
    arrays = mesh.shard_batch(
        {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    )
    sharding = arrays["image"].sharding
    # leading axis sharded over the data axis
    assert sharding.spec[0] == "data"
    with pytest.raises(AssertionError):
        mesh.shard_batch({"x": np.zeros((3, 4), np.float32)})  # 3 % 8 != 0


def test_dp_validation_and_predict():
    mesh = DataParallel.create()
    _, trainer = _setup(mesh=mesh)
    batch = _batch()
    metrics, targets, preds = trainer.validation_step("A", batch)
    assert np.isfinite(metrics["loss/loss"])
    assert preds.shape == (16, 40)
    out = trainer.predict("A", batch)
    assert out.shape == (16, 40)
    np.testing.assert_allclose(out, preds, rtol=1e-5)
