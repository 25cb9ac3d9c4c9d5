"""End-to-end training tests on the synthetic fixture: the loss must go
down, the scheduler must checkpoint/rollback/early-stop correctly, and
training must resume from checkpoints (SURVEY.md §4 integration oracle)."""

import os

import numpy as np
import pytest

from v1t_tpu import training
from v1t_tpu.configs import Config
from v1t_tpu.data import get_mouse_ids, get_training_ds
from v1t_tpu.data.synthetic import generate_dataset
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model
from v1t_tpu.optim import get_learning_rates
from v1t_tpu.utils.scheduler import Scheduler


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return generate_dataset(str(root), ds_name="sensorium", mouse_ids=("A", "B"))


def _small_config(data_dir, out_dir, **kw):
    defaults = dict(
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
        p_dropout=0.0,
        t_dropout=0.1,
        lr=3e-3,
        core_reg_scale=0.0,
        readout_reg_scale=0.0,
        precision="fp32",
        verbose=0,
        mouse_ids=["A", "B"],
    )
    defaults.update(kw)
    cfg = Config(**defaults)
    get_mouse_ids(cfg)
    return cfg


def _build(cfg):
    train_ds, val_ds, test_ds, card = get_training_ds(
        cfg, data_dir=cfg.dataset, mouse_ids=cfg.mouse_ids,
        batch_size=cfg.batch_size,
    )
    model = build_model(cfg, card)
    params = init_model(model, seed=cfg.seed)
    trainer = training.Trainer(cfg, model, params, card)
    return train_ds, val_ds, test_ds, card, trainer


@pytest.mark.slow
def test_loss_decreases_and_validation_works(data_dir, tmp_path):
    cfg = _small_config(data_dir, tmp_path / "run")
    train_ds, val_ds, test_ds, card, trainer = _build(cfg)

    first = training.train_epoch(trainer, ds=train_ds, epoch=1)
    losses = [first["loss"]]
    val_first = training.validate(trainer, ds=val_ds, epoch=1)
    for epoch in range(2, 15):
        losses.append(training.train_epoch(trainer, ds=train_ds, epoch=epoch)["loss"])
    assert losses[-1] < losses[0], f"training loss did not decrease: {losses}"

    val = training.validate(trainer, ds=val_ds, epoch=14)
    assert np.isfinite(val["loss"])
    assert "single_trial_correlation" in val
    # synthetic data has real structure: correlation must improve over
    # training and end clearly positive. The margin is trend-based rather
    # than an absolute razor-edge threshold — XLA CPU thread scheduling
    # jitters the numerics run-to-run on a tiny 14-epoch model.
    assert val["single_trial_correlation"] > 0.01, (val, losses)
    assert (
        val["single_trial_correlation"]
        > val_first["single_trial_correlation"]
    ), (val_first, val)


def test_evaluate_writes_yaml(data_dir, tmp_path):
    cfg = _small_config(data_dir, tmp_path / "run")
    train_ds, val_ds, test_ds, card, trainer = _build(cfg)
    result = training.evaluate(
        cfg, trainer, ds=test_ds, epoch=0, save_result=cfg.output_dir
    )
    assert "single_trial_correlation" in result
    assert "correlation_to_average" in result  # test tier has repeats
    assert "feve" in result
    assert os.path.exists(os.path.join(cfg.output_dir, "evaluation.yaml"))


def test_scheduler_state_machine(tmp_path):
    """Improvement -> checkpoint; plateau -> rollback + lr decay; early stop
    after max_reduce reductions (reference scheduler.py:173-197)."""
    cfg = Config(output_dir=str(tmp_path / "sched"), verbose=0)
    os.makedirs(cfg.output_dir, exist_ok=True)

    import jax.numpy as jnp
    import optax

    from v1t_tpu import optim as vopt

    params = {"core": {"w": jnp.ones(3)}, "readouts": {"readout_A": {"b": jnp.zeros(2)}}}
    tx, opt_state = vopt.build_optimizer(cfg, params)
    sched = Scheduler(cfg, mode="max", lr_patience=1, max_reduce=2)

    lr0 = get_learning_rates(opt_state)["core"]

    # epoch 1: improvement -> checkpoint saved
    stop, params, opt_state = sched.step(0.5, 1, params, opt_state)
    assert not stop and os.path.exists(sched.checkpoint_path)
    assert sched.best_value == 0.5

    # mutate params; epochs of no improvement -> wait, then rollback + decay
    params = {"core": {"w": jnp.full(3, 9.0)}, "readouts": params["readouts"]}
    stop, params, opt_state = sched.step(0.4, 2, params, opt_state)  # wait 1
    assert not stop
    stop, params, opt_state = sched.step(0.4, 3, params, opt_state)  # reduce 1
    assert not stop
    np.testing.assert_allclose(np.asarray(params["core"]["w"]), 1.0)  # rolled back
    lr1 = get_learning_rates(opt_state)["core"]
    np.testing.assert_allclose(lr1, 0.3 * lr0, rtol=1e-5)

    stop, params, opt_state = sched.step(0.4, 4, params, opt_state)  # wait
    stop, params, opt_state = sched.step(0.4, 5, params, opt_state)  # reduce 2
    assert not stop
    lr2 = get_learning_rates(opt_state)["core"]
    np.testing.assert_allclose(lr2, 0.09 * lr0, rtol=1e-5)

    stop, params, opt_state = sched.step(0.4, 6, params, opt_state)  # wait
    stop, params, opt_state = sched.step(0.4, 7, params, opt_state)  # terminate
    assert stop

    # improvement resets counters
    sched2 = Scheduler(cfg, mode="max", lr_patience=1, max_reduce=2)
    sched2.num_reduce = 2
    stop, params, opt_state = sched2.step(0.9, 8, params, opt_state)
    assert not stop and sched2.num_reduce == 0


def test_restore_best_reloads_model_state(tmp_path):
    """The final test evaluation must run with the BEST epoch's BatchNorm
    statistics, not the last epoch's — restore_best reloads model_state
    alongside the params (reference scheduler.py:122-136 restores the full
    state_dict, batch stats included)."""
    import types

    import jax.numpy as jnp

    from v1t_tpu import optim as vopt

    cfg = Config(output_dir=str(tmp_path / "bn"), verbose=0)
    os.makedirs(cfg.output_dir, exist_ok=True)
    params = {"core": {"w": jnp.ones(3)}}
    tx, opt_state = vopt.build_optimizer(cfg, params)
    sched = Scheduler(cfg, mode="max")

    best_stats = {"batch_stats": {"core": {"mean": jnp.full(4, 2.0)}}}
    sched.step(0.5, 1, params, opt_state, model_state=best_stats)

    # later (worse) epochs mutate both params and batch stats
    trainer = types.SimpleNamespace(
        params={"core": {"w": jnp.full(3, 9.0)}},
        model_state={"batch_stats": {"core": {"mean": jnp.full(4, 7.0)}}},
    )
    training.restore_best(sched, trainer)
    np.testing.assert_allclose(np.asarray(trainer.params["core"]["w"]), 1.0)
    np.testing.assert_allclose(
        np.asarray(trainer.model_state["batch_stats"]["core"]["mean"]), 2.0
    )


def test_checkpoint_resume(data_dir, tmp_path):
    """Restoring {params, optimizer, scheduler} must resume training exactly
    where it stopped (reference scheduler.py:104-144)."""
    cfg = _small_config(data_dir, tmp_path / "resume")
    train_ds, val_ds, _, card, trainer = _build(cfg)
    sched = Scheduler(cfg, mode="max")

    training.train_epoch(trainer, ds=train_ds, epoch=1)
    val = training.validate(trainer, ds=val_ds, epoch=1)
    stop, trainer.params, trainer.opt_state = sched.step(
        val["single_trial_correlation"], 1, trainer.params, trainer.opt_state
    )
    best = sched.best_value

    # fresh trainer + scheduler restore
    _, _, _, _, trainer2 = _build(cfg)
    sched2 = Scheduler(cfg, mode="max")
    epoch, trainer2.params, trainer2.opt_state = sched2.restore(
        trainer2.params, trainer2.opt_state,
        load_optimizer=True, load_scheduler=True,
    )
    assert epoch == 1
    assert sched2.best_value == best
    # params identical to the checkpointed ones
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.params),
        jax.tree_util.tree_leaves(trainer2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # optimizer moments restored (non-zero after an update)
    mu_leaves = jax.tree_util.tree_leaves(
        trainer2.opt_state.inner_states["rest"].inner_state
    )
    assert any(np.any(np.asarray(leaf) != 0) for leaf in mu_leaves
               if hasattr(leaf, "shape"))


def test_micro_batching_grads_match_full_batch(data_dir, tmp_path):
    """Gradient accumulation over micro-batches must equal the full-batch
    gradient (the ds_scale/reg_weight bookkeeping of reference
    train.py:56-76)."""
    import jax

    cfg_full = _small_config(data_dir, tmp_path / "full", t_dropout=0.0,
                             core_reg_scale=0.1, readout_reg_scale=0.01)
    train_ds, _, _, card, trainer_full = _build(cfg_full)
    batch = next(iter(train_ds["A"]))

    cfg_micro = _small_config(data_dir, tmp_path / "micro", t_dropout=0.0,
                              core_reg_scale=0.1, readout_reg_scale=0.01,
                              micro_batch_size=6)
    _, _, _, _, trainer_micro = _build(cfg_micro)
    # identical initial params (same seed) — verify
    for a, b in zip(
        jax.tree_util.tree_leaves(trainer_full.params),
        jax.tree_util.tree_leaves(trainer_micro.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # grid-sampling noise differs between the two paths (different rng folds),
    # so compare DETERMINISTIC (eval-mode) gradients: accumulate grads over
    # micro-batches with the reference's ds_scale/reg_weight bookkeeping and
    # check they equal the full-batch gradient exactly
    import jax.numpy as jnp

    from v1t_tpu.data.loaders import micro_batching
    from v1t_tpu.training import pad_batch

    def accumulated_grads(trainer, micro_size):
        total = len(batch["image"])
        acc = None
        for micro in micro_batching(batch, micro_size):
            padded, mask = pad_batch(micro, micro_size)
            arrays = {
                k: jnp.asarray(v)
                for k, v in padded.items()
                if k in ("image", "response", "behavior", "pupil_center")
            }

            def loss_fn(p):
                loss, reg, _, _ = trainer._loss_terms(
                    p, {}, arrays, jnp.asarray(mask), None, "A", train=False,
                    batch_size=np.float32(total),
                    reg_weight=np.float32(len(micro["image"]) / total),
                )
                return loss + reg

            g = jax.grad(loss_fn)(trainer.params)
            acc = g if acc is None else jax.tree_util.tree_map(jnp.add, acc, g)
        return acc

    g_full = accumulated_grads(trainer_full, 16)
    g_micro = accumulated_grads(trainer_micro, 6)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_full), jax.tree_util.tree_leaves(g_micro)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_frozen_core_gets_no_updates(data_dir, tmp_path):
    import jax

    cfg = _small_config(data_dir, tmp_path / "frozen")
    train_ds, val_ds, test_ds, card = get_training_ds(
        cfg, data_dir=cfg.dataset, mouse_ids=cfg.mouse_ids,
        batch_size=cfg.batch_size,
    )
    model = build_model(cfg, card)
    params = init_model(model, seed=cfg.seed)
    trainer = training.Trainer(cfg, model, params, card, core_frozen=True)
    core_before = jax.tree_util.tree_map(np.asarray, trainer.params["core"])
    training.train_epoch(trainer, ds=train_ds, epoch=1)
    core_after = trainer.params["core"]
    for a, b in zip(
        jax.tree_util.tree_leaves(core_before),
        jax.tree_util.tree_leaves(core_after),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
