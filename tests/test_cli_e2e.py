"""End-to-end CLI tests: train.main -> submission.main -> ensemble.main on
the synthetic fixture (BASELINE.json config #4 acceptance path)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # full CLI trainings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ensemble as ensemble_cli
import submission as submission_cli
import train as train_cli
from v1t_tpu.configs import Config, load_args
from v1t_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return generate_dataset(
        str(root),
        ds_name="sensorium",
        mouse_ids=("S1", "A"),
        num_final_test=10,
    )


def _train_config(data_dir, out_dir, seed=1234):
    return Config(
        dataset=data_dir,
        output_dir=str(out_dir),
        behavior_mode=3,
        shift_mode=2,
        core="vit",
        readout="gaussian2d",
        batch_size=16,
        epochs=2,
        num_blocks=2,
        emb_dim=16,
        num_heads=2,
        mlp_dim=32,
        patch_size=8,
        patch_stride=4,
        p_dropout=0.0,
        t_dropout=0.1,
        precision="fp32",
        verbose=0,
        seed=seed,
        mouse_ids=["S1", "A"],
        data_parallel=1,  # single device in this test
    )


@pytest.fixture(scope="module")
def trained_run(data_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("runs") / "run1"
    cfg = _train_config(data_dir, out)
    result = train_cli.main(cfg)
    return str(out), result


def test_train_main_outputs(trained_run):
    out, result = trained_run
    assert os.path.exists(os.path.join(out, "args.yaml"))
    assert os.path.exists(os.path.join(out, "ckpt", "model_state.msgpack"))
    assert os.path.exists(os.path.join(out, "evaluation.yaml"))
    assert os.path.exists(os.path.join(out, "output.log"))
    assert "single_trial_correlation" in result
    # args.yaml replay round-trips
    cfg = load_args(out)
    assert cfg.core == "vit"
    assert cfg.output_shapes == {"S1": (64,), "A": (64,)}


def test_train_resume_continues(trained_run, data_dir):
    out, _ = trained_run
    cfg = load_args(out, overrides={"epochs": 3, "verbose": 0})
    cfg.mouse_ids = ["S1", "A"]
    result = train_cli.main(cfg)  # resumes from epoch 2, runs epoch 3
    assert "single_trial_correlation" in result


def test_submission_csvs(trained_run):
    out, _ = trained_run

    class A:
        output_dir = out
        dataset = None
        batch_size = 16
        verbose = 0

    submission_cli.main(A())
    sub_root = os.path.join(out, "submissions")
    stamp = sorted(os.listdir(sub_root))[-1]
    sub_dir = os.path.join(sub_root, stamp, "sensorium+")
    live = pd.read_csv(os.path.join(sub_dir, "live_test.csv"))
    final = pd.read_csv(os.path.join(sub_dir, "final_test.csv"))
    assert list(live.columns) == [
        "trial_indices", "image_ids", "prediction", "neuron_ids",
    ]
    assert len(live) == 20  # test tier size of the fixture
    assert len(final) == 10
    # predictions are positive (ELU1) response vectors
    first = eval(live["prediction"][0])
    assert len(first) == 64 and all(v > 0 for v in first)


def test_ensemble_modes(trained_run, data_dir, tmp_path_factory):
    run1, _ = trained_run
    # train a second model with a different seed
    out2 = tmp_path_factory.mktemp("runs") / "run2"
    train_cli.main(_train_config(data_dir, out2, seed=99))

    # mode 0 (average, no training)
    ens_out = tmp_path_factory.mktemp("runs") / "ens0"
    cfg = Config(
        dataset=data_dir,
        output_dir=str(ens_out),
        behavior_mode=3,
        ensemble_mode=0,
        batch_size=16,
        precision="fp32",
        verbose=0,
        mouse_ids=["S1", "A"],
    )
    ensemble_cli.main(cfg, saved_models={"m1": run1, "m2": str(out2)})
    subs = os.path.join(str(ens_out), "submissions")
    assert os.path.isdir(subs) and len(os.listdir(subs)) == 1

    # mode 2 (per-mouse linear head) with training
    ens_out2 = tmp_path_factory.mktemp("runs") / "ens2"
    cfg2 = Config(
        dataset=data_dir,
        output_dir=str(ens_out2),
        behavior_mode=3,
        ensemble_mode=2,
        train=True,
        epochs=2,
        batch_size=16,
        lr=1e-2,
        precision="fp32",
        verbose=0,
        mouse_ids=["S1", "A"],
    )
    ensemble_cli.main(cfg2, saved_models={"m1": run1, "m2": str(out2)})
    # output-head-only checkpoint
    from v1t_tpu.utils.scheduler import load_checkpoint_file

    ckpt = load_checkpoint_file(
        os.path.join(str(ens_out2), "ckpt", "model_state.msgpack")
    )
    assert set(ckpt["model"].keys()) == {"output_module"}
    assert "linear_S1" in ckpt["model"]["output_module"]


def test_train_data_parallel_cli_matches_single_device(
    trained_run, data_dir, tmp_path_factory
):
    """Full train.py CLI on the 8-device virtual mesh (VERDICT r3 #5):
    --data_parallel 8 end to end — epochs, cross-mouse grad accumulation,
    optimizer updates, scheduler checkpointing, evaluation, submission —
    must reproduce the single-device run: same final challenge metrics and
    the same best-checkpoint parameters leaf for leaf (grad psum over the
    mesh == single-device sum)."""
    import jax

    from v1t_tpu.utils.scheduler import CKPT_NAME, load_checkpoint_file

    run_single, result_single = trained_run
    out_dp = tmp_path_factory.mktemp("runs") / "run_dp"
    cfg = _train_config(data_dir, out_dp)
    cfg.data_parallel = 8
    result_dp = train_cli.main(cfg)

    for key, val in result_single.items():
        if isinstance(val, float):
            assert abs(result_dp[key] - val) < 2e-3, (
                key, result_dp[key], val,
            )

    c_single = load_checkpoint_file(
        os.path.join(run_single, "ckpt", CKPT_NAME)
    )
    c_dp = load_checkpoint_file(os.path.join(str(out_dp), "ckpt", CKPT_NAME))
    assert c_dp["epoch"] == c_single["epoch"]
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(c_single["model"])[0],
        jax.tree_util.tree_flatten_with_path(c_dp["model"])[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6,
            err_msg=f"DP checkpoint diverged at {pa}",
        )

    # the DP run dir serves the downstream tools exactly like a native run
    class A:
        output_dir = str(out_dp)
        dataset = None
        batch_size = 16
        verbose = 0

    submission_cli.main(A())
    sub_root = os.path.join(str(out_dp), "submissions")
    stamp = sorted(os.listdir(sub_root))[-1]
    live = pd.read_csv(
        os.path.join(sub_root, stamp, "sensorium+", "live_test.csv")
    )
    assert len(live) == 20


def test_train_sequence_parallel_cli_wiring(data_dir, tmp_path_factory):
    """train.py's --sequence_parallel block end to end on the virtual mesh
    (ADVICE r4 high: the warning block accessed model.core.num_patches on
    the unbound Model and crashed every multi-device SP run with core=vit).
    bf16 makes the fused-path predicate fire so the warning prints too."""
    out = tmp_path_factory.mktemp("runs") / "run_sp"
    cfg = _train_config(data_dir, out)
    cfg.epochs = 1
    cfg.precision = "bf16"  # sp_bypasses_fused_attention -> True at 1654<=N
    cfg.data_parallel = 4
    cfg.sequence_parallel = 2
    result = train_cli.main(cfg)
    assert "single_trial_correlation" in result
    assert np.isfinite(result["single_trial_correlation"])
    # the Logger tees stdout to output.log; assert the warning there
    with open(os.path.join(str(out), "output.log")) as f:
        log = f.read()
    assert "sequence_parallel shards attention" in log
