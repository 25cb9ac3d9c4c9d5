"""Secondary cores: cct, stacked2d (BatchNorm state), stn — shapes, training
step, and state threading."""

import jax
import numpy as np
import pytest

from v1t_tpu import training
from v1t_tpu.configs import Config
from v1t_tpu.data import get_mouse_ids, get_training_ds
from v1t_tpu.data.cards import synthetic_data_card
from v1t_tpu.data.synthetic import generate_dataset
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model_variables


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return generate_dataset(str(root), ds_name="sensorium", mouse_ids=("A",))


def _cfg(core, data_dir, out, **kw):
    defaults = dict(
        dataset=data_dir,
        output_dir=str(out),
        core=core,
        readout="gaussian2d",
        behavior_mode=0,
        shift_mode=0,
        batch_size=8,
        num_blocks=2,
        num_layers=2,
        num_filters=8,
        emb_dim=16,
        num_heads=2,
        mlp_dim=32,
        patch_size=8,
        patch_stride=4,
        dropout=0.1,
        precision="fp32",
        resize_image=0,
        verbose=0,
        mouse_ids=["A"],
        core_reg_scale=0.0,
        readout_reg_scale=0.0,
    )
    defaults.update(kw)
    cfg = Config(**defaults)
    get_mouse_ids(cfg)
    return cfg


@pytest.mark.parametrize("core", ["cct", "stacked2d", "stn"])
def test_core_forward_shapes(core):
    cfg = Config(
        core=core, behavior_mode=0, num_blocks=2, num_layers=2, num_filters=8,
        emb_dim=16, num_heads=2, mlp_dim=32, patch_size=8, patch_stride=4,
        precision="fp32", shift_mode=0, resize_image=0,
    )
    card = synthetic_data_card(
        mouse_ids=("A",), num_neurons=30, input_shape=(1, 36, 64)
    )
    model = build_model(cfg, card)
    params, state = init_model_variables(model, seed=0)
    if core in ("stacked2d", "stn"):
        assert "batch_stats" in state  # BatchNorm running stats exist
    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 1, 36, 64)).astype(np.float32)
    out, _, _ = model.apply(
        {"params": params, **state},
        images,
        mouse_id="A",
        behaviors=np.zeros((2, 3), np.float32),
        pupil_centers=np.zeros((2, 2), np.float32),
    )
    assert out.shape == (2, 30)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("core", ["stacked2d", "stn"])
def test_bn_cores_train_and_update_stats(core, data_dir, tmp_path):
    cfg = _cfg(core, data_dir, tmp_path / core)
    train_ds, val_ds, _, card = get_training_ds(
        cfg, data_dir=cfg.dataset, mouse_ids=["A"], batch_size=8
    )
    model = build_model(cfg, card)
    params, state = init_model_variables(model, seed=0)
    trainer = training.Trainer(cfg, model, params, card, model_state=state)

    stats_before = jax.tree_util.tree_map(
        np.asarray, trainer.model_state["batch_stats"]
    )
    result = training.train_epoch(trainer, ds=train_ds, epoch=1)
    assert np.isfinite(result["loss"])
    # running statistics moved
    moved = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(
            jax.tree_util.tree_leaves(trainer.model_state["batch_stats"]),
            jax.tree_util.tree_leaves(stats_before),
        )
    )
    assert moved
    val = training.validate(trainer, ds=val_ds, epoch=1)
    assert np.isfinite(val["loss"])


def test_cct_trains(data_dir, tmp_path):
    cfg = _cfg("cct", data_dir, tmp_path / "cct", behavior_mode=3, shift_mode=2,
               t_dropout=0.1, p_dropout=0.0, pos_emb="sine", drop_path=0.1)
    train_ds, _, _, card = get_training_ds(
        cfg, data_dir=cfg.dataset, mouse_ids=["A"], batch_size=8
    )
    model = build_model(cfg, card)
    params, state = init_model_variables(model, seed=0)
    trainer = training.Trainer(cfg, model, params, card, model_state=state)
    r1 = training.train_epoch(trainer, ds=train_ds, epoch=1)
    r2 = training.train_epoch(trainer, ds=train_ds, epoch=2)
    r3 = training.train_epoch(trainer, ds=train_ds, epoch=3)
    assert r3["loss"] < r1["loss"]
