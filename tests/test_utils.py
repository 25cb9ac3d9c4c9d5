"""Utility smoke tests: logger tee, plots, profiler timer, tensorboard."""

import os
import sys

import numpy as np

from v1t_tpu.configs import Config, load_args, save_args
from v1t_tpu.utils.logger import Logger
from v1t_tpu.utils.profiler import StepTimer


def test_logger_tee(tmp_path, capsys):
    logger = Logger(str(tmp_path))
    print("hello-log-line")
    print("progress\rredraw", end="")
    logger.close()
    log = open(os.path.join(str(tmp_path), "output.log")).read()
    assert "hello-log-line" in log
    assert "redraw" not in log  # carriage-return lines filtered
    assert sys.stdout is sys.__stdout__


def test_args_yaml_roundtrip(tmp_path):
    cfg = Config(
        output_dir=str(tmp_path), dataset="data/sensorium", core="vit",
        readout="gaussian2d", behavior_mode=3, mouse_ids=["A", "B"],
        output_shapes={"A": (100,), "B": (200,)}, input_shape=(1, 36, 64),
    )
    save_args(cfg)
    loaded = load_args(str(tmp_path))
    assert loaded.core == "vit"
    assert loaded.behavior_mode == 3
    assert loaded.mouse_ids == ["A", "B"]
    assert loaded.output_shapes == {"A": (100,), "B": (200,)}
    assert loaded.input_shape == (1, 36, 64)
    # overrides win
    loaded2 = load_args(str(tmp_path), overrides={"batch_size": 99})
    assert loaded2.batch_size == 99


def test_step_timer():
    timer = StepTimer()
    import jax.numpy as jnp

    for _ in range(3):
        timer.start()
        x = jnp.ones(10).sum()
        timer.stop(x)
    assert len(timer.times) == 3 and timer.mean > 0


def test_plot_samples(tmp_path):
    from v1t_tpu import training
    from v1t_tpu.data import get_mouse_ids, get_training_ds
    from v1t_tpu.data.synthetic import generate_dataset
    from v1t_tpu.models import build_model
    from v1t_tpu.models.model import init_model
    from v1t_tpu.utils.plots import plot_samples
    from v1t_tpu.utils.tensorboard import Summary

    data_dir = generate_dataset(str(tmp_path), ds_name="sensorium",
                                mouse_ids=("A",))
    cfg = Config(
        dataset=data_dir, output_dir=str(tmp_path / "run"), behavior_mode=3,
        shift_mode=2, core="vit", readout="gaussian2d", batch_size=8,
        num_blocks=1, emb_dim=16, num_heads=2, mlp_dim=16, patch_size=8,
        patch_stride=8, precision="fp32", verbose=0, mouse_ids=["A"],
        save_plots=True, format="png",
    )
    get_mouse_ids(cfg)
    train_ds, val_ds, _, card = get_training_ds(
        cfg, data_dir=data_dir, mouse_ids=["A"], batch_size=8
    )
    model = build_model(cfg, card)
    params = init_model(model)
    trainer = training.Trainer(cfg, model, params, card)
    summary = Summary(cfg)
    plot_samples(cfg, trainer, ds=val_ds, summary=summary, epoch=1, num_plots=2)
    summary.close()
    plots = os.listdir(os.path.join(cfg.output_dir, "plots"))
    assert len(plots) == 2 and all(p.endswith(".png") for p in plots)


def test_write_model_summaries(tmp_path):
    """model.txt / model_core.txt / model_readout.txt run-directory contract
    (reference model.py:19-47, 211-224)."""
    import os

    from v1t_tpu.configs import Config
    from v1t_tpu.data.cards import synthetic_data_card
    from v1t_tpu.models import build_model
    from v1t_tpu.utils.summary import write_model_summaries

    cfg = Config(
        core="vit", readout="gaussian2d", behavior_mode=3, shift_mode=2,
        precision="fp32", num_blocks=2, emb_dim=16, num_heads=2, mlp_dim=32,
        patch_stride=8, resize_image=0,
    )
    card = synthetic_data_card(
        mouse_ids=("A", "B"), num_neurons=50, input_shape=(1, 36, 64)
    )
    model = build_model(cfg, card)
    write_model_summaries(cfg, model, card, str(tmp_path))
    for name in ("model.txt", "model_core.txt", "model_readout.txt"):
        path = tmp_path / name
        assert path.exists() and os.path.getsize(path) > 500, name
    assert "Model Summary" in (tmp_path / "model.txt").read_text()


def test_sweep_yaml_space_sampling():
    """configs/sweep_v1t.yaml parses and its parameter space samples valid
    Config overrides (sweep.py local mode)."""
    import numpy as np

    import sweep as sweep_cli

    spec = sweep_cli.load_sweep_yaml("configs/sweep_v1t.yaml")
    assert spec["metric"]["name"] == "val_corr"
    rng = np.random.default_rng(0)
    for _ in range(5):
        o = sweep_cli.sample_from_yaml_space(spec["parameters"], rng)
        assert o["patch_size"] in (4, 8, 16)
        assert 64 <= o["emb_dim"] <= 256 and isinstance(o["emb_dim"], int)
        assert 0.0001 <= o["lr"] <= 0.01
        assert 0.0 <= o["t_dropout"] <= 0.5
        assert o["criterion"] == "poisson"
