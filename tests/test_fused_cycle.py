"""Fused-cycle training path: one jitted program per mouse cycle (grads +
accumulation + optimizer update, Trainer.train_cycle) must train EXACTLY like
the per-step dispatch path it replaces (reference schedule train.py:84-116 —
same grad programs, same fp32 accumulation order, same fold_in RNG stream).
The fused path exists for dispatch latency on remote-attached TPUs
(BENCH_NOTES round 5); numerics must not know the difference."""

import numpy as np
import pytest

from v1t_tpu import training
from v1t_tpu.configs import Config
from v1t_tpu.data import get_mouse_ids, get_training_ds
from v1t_tpu.data.synthetic import generate_dataset
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return generate_dataset(str(root), ds_name="sensorium", mouse_ids=("A", "B"))


def _build(data_dir, out_dir):
    cfg = Config(
        dataset=data_dir,
        output_dir=str(out_dir),
        behavior_mode=3,
        shift_mode=2,
        core="vit",
        readout="gaussian2d",
        batch_size=16,
        num_blocks=2,
        emb_dim=16,
        num_heads=2,
        mlp_dim=32,
        patch_size=8,
        patch_stride=4,
        p_dropout=0.1,
        t_dropout=0.1,
        lr=3e-3,
        core_reg_scale=0.5,
        readout_reg_scale=0.01,
        precision="fp32",
        verbose=0,
        mouse_ids=["A", "B"],
    )
    get_mouse_ids(cfg)
    train_ds, _, _, card = get_training_ds(
        cfg, data_dir=cfg.dataset, mouse_ids=cfg.mouse_ids,
        batch_size=cfg.batch_size,
    )
    model = build_model(cfg, card)
    params = init_model(model, seed=cfg.seed)
    trainer = training.Trainer(cfg, model, params, card)
    return train_ds, trainer


def test_fused_cycle_matches_per_step(data_dir, tmp_path, monkeypatch):
    import jax

    results = {}
    for mode in ("fused", "per_step"):
        monkeypatch.setenv(
            "V1T_FUSED_CYCLE", "1" if mode == "fused" else "0"
        )
        train_ds, trainer = _build(data_dir, tmp_path / mode)
        epochs = []
        for epoch in (1, 2):
            epochs.append(
                training.train_epoch(trainer, ds=train_ds, epoch=epoch)
            )
        if mode == "fused":
            assert trainer._cycle_fns, "fused path was not taken"
        else:
            assert not trainer._cycle_fns, "per-step run used the fused path"
        results[mode] = (epochs, trainer.params, trainer._step_count)

    (ep_f, params_f, steps_f) = results["fused"]
    (ep_s, params_s, steps_s) = results["per_step"]
    assert steps_f == steps_s  # identical fold_in RNG stream
    for a, b in zip(ep_f, ep_s):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6)

    flat_f = jax.tree_util.tree_leaves_with_path(params_f)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(params_s))
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_s[path]),
            rtol=1e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(path),
        )


def test_micro_batching_falls_back(data_dir, tmp_path, monkeypatch):
    """micro_batch_size < batch_size splits each batch into several micros —
    the fused path must decline and the per-step path must still train."""
    monkeypatch.setenv("V1T_FUSED_CYCLE", "1")
    cfg = Config(
        dataset=data_dir,
        output_dir=str(tmp_path / "micro"),
        behavior_mode=3,
        shift_mode=2,
        core="vit",
        readout="gaussian2d",
        batch_size=16,
        micro_batch_size=8,
        num_blocks=1,
        emb_dim=16,
        num_heads=2,
        mlp_dim=32,
        patch_size=8,
        patch_stride=4,
        lr=3e-3,
        precision="fp32",
        verbose=0,
        mouse_ids=["A", "B"],
    )
    get_mouse_ids(cfg)
    train_ds, _, _, card = get_training_ds(
        cfg, data_dir=cfg.dataset, mouse_ids=cfg.mouse_ids,
        batch_size=cfg.batch_size,
    )
    model = build_model(cfg, card)
    params = init_model(model, seed=cfg.seed)
    trainer = training.Trainer(cfg, model, params, card)
    out = training.train_epoch(trainer, ds=train_ds, epoch=1)
    assert not trainer._cycle_fns
    assert np.isfinite(out["loss"])
