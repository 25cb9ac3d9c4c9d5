"""Offline observability schema tests (VERDICT r3 #10): the wandb-mode
sweep and per-epoch wandb logging, and the TensorBoard HParams rows, have
no network to run against in this environment — pin the logged artifact
schemas with a mock wandb module and the TB event-file reader so a live
run can't silently break.

Reference surfaces matched: wandb glue (reference utils/utils.py:308-338,
train.py:288-318) and sweep.py's wandb.agent flow (reference sweep.py:58-87).
"""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # runs short trainings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import train as train_cli
from v1t_tpu.configs import Config
from v1t_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return generate_dataset(
        str(root), ds_name="sensorium", mouse_ids=("A",), num_neurons=32,
        num_train=32, num_validation=16,
    )


class _FakeRun:
    def __init__(self, config=None, run_id="fake01"):
        self.config = config or {}
        self.id = run_id
        self.logged = []
        self.finished = None

    def log(self, payload, step=None):
        self.logged.append((step, dict(payload)))

    def finish(self, exit_code=0):
        self.finished = exit_code


def _install_fake_wandb(monkeypatch):
    fake = types.ModuleType("wandb")
    fake.runs = []
    fake.sweeps = []
    fake.agent_calls = []

    def init(project=None, group=None, config=None, **kw):
        run = _FakeRun(config=config)
        fake.runs.append(
            {"project": project, "group": group, "config": config,
             "run": run}
        )
        return run

    def sweep(cfg, project=None):
        fake.sweeps.append({"config": cfg, "project": project})
        return "sweep123"

    def agent(sweep_id, function=None, count=1):
        fake.agent_calls.append({"sweep_id": sweep_id, "count": count})
        for _ in range(count):
            function()

    fake.init = init
    fake.sweep = sweep
    fake.agent = agent
    monkeypatch.setitem(sys.modules, "wandb", fake)
    return fake


def _tiny_config(data_dir, out_dir, **kw):
    cfg = Config(
        dataset=data_dir, output_dir=str(out_dir), core="vit",
        readout="gaussian2d", behavior_mode=3, shift_mode=2, batch_size=8,
        epochs=2, num_blocks=1, emb_dim=16, num_heads=2, mlp_dim=32,
        patch_size=8, patch_stride=8, p_dropout=0.0, t_dropout=0.0,
        precision="fp32", verbose=0, seed=7, mouse_ids=["A"],
        use_wandb=True,
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_wandb_epoch_log_schema(data_dir, tmp_path, monkeypatch):
    """train.main with --use_wandb logs the reference's per-epoch keys
    (train.py:288-298) plus the final test metric (train.py:317-318), and
    the init config is scrubbed to scalars."""
    fake = _install_fake_wandb(monkeypatch)
    cfg = _tiny_config(data_dir, tmp_path / "run")
    train_cli.main(cfg)

    assert len(fake.runs) == 1
    init = fake.runs[0]
    assert init["project"] == "v1t_tpu"
    # config scrubbed to yaml-safe scalars (no lists/arrays/None)
    assert init["config"], "wandb.init received no config"
    for k, v in init["config"].items():
        assert isinstance(v, (int, float, str, bool)), (k, type(v))

    run = init["run"]
    epoch_logs = [p for _, p in run.logged if "val_corr" in p]
    assert len(epoch_logs) == cfg.epochs
    for payload in epoch_logs:
        assert set(payload) == {
            "train_loss", "val_loss", "val_corr", "best_corr", "elapse",
        }
        assert np.isfinite(payload["train_loss"])
    final = [p for _, p in run.logged if "test_corr" in p]
    assert len(final) == 1 and np.isfinite(final[0]["test_corr"])


def test_wandb_sweep_agent_flow(data_dir, tmp_path, monkeypatch):
    """sweep.py's wandb mode: creates the sweep from the YAML, runs the
    agent, and each trial trains with the run's overrides applied and logs
    through the run object (reference sweep.py:58-87)."""
    import sweep as sweep_cli

    fake = _install_fake_wandb(monkeypatch)

    # agent-created runs carry the sweep's parameter draw in run.config
    real_init = fake.init

    def sweep_init(**kw):
        run = real_init(**kw)
        if kw.get("config") is None:  # the agent's bare wandb.init()
            run.config = {"lr": 1e-3, "emb_dim": 16}
        return run

    fake.init = sweep_init

    args = types.SimpleNamespace(
        sweep_id=None, sweep_config="configs/sweep_v1t.yaml", count=1,
        local=0, output_dir=str(tmp_path / "sweep"), dataset=data_dir,
        epochs=1, batch_size=8, verbose=0, mouse_ids=["A"],
        behavior_mode=3, core="vit", readout="gaussian2d", limit_data=None,
    )
    # shrink the trial so it trains in seconds
    base = sweep_cli.base_config(args)
    monkeypatch.setattr(
        sweep_cli, "base_config",
        lambda a: {**base, "num_blocks": 1, "num_heads": 2, "mlp_dim": 32,
                   "patch_stride": 8, "precision": "fp32",
                   "behavior_mode": 3, "shift_mode": 2},
    )
    sweep_cli.run_wandb_sweep(args)

    assert fake.sweeps and fake.sweeps[0]["config"].get("parameters")
    assert fake.agent_calls == [{"sweep_id": "sweep123", "count": 1}]
    # the trial's init happened and logged epochs
    trial_runs = [r["run"] for r in fake.runs if r["run"].logged]
    assert trial_runs, "sweep trial never logged to wandb"
    assert any("val_corr" in p for _, p in trial_runs[0].logged)
    # the trial consumed the run.config override (lr landed in args.yaml)
    import glob

    import yaml as pyyaml

    args_files = glob.glob(str(tmp_path / "sweep" / "*" / "args.yaml"))
    assert args_files
    saved = pyyaml.safe_load(open(args_files[0]))
    assert saved["lr"] == pytest.approx(1e-3)
    assert saved["emb_dim"] == 16


def test_tensorboard_hparams_row(data_dir, tmp_path):
    """The HParams row train.py writes at the end of a run is readable by
    the TensorBoard event machinery and carries hparam + metric tags."""
    from tensorboard.backend.event_processing import event_accumulator

    cfg = _tiny_config(data_dir, tmp_path / "run_tb", use_wandb=False)
    train_cli.main(cfg)

    # add_hparams writes a nested run dir with an hparams-plugin session
    event_files = []
    for base, _, files in os.walk(str(tmp_path / "run_tb")):
        event_files += [
            os.path.join(base, f) for f in files if "tfevents" in f
        ]
    assert event_files, "no TB event files written"
    found_session = False
    scalar_tags = set()
    for f in sorted(event_files):
        acc = event_accumulator.EventAccumulator(os.path.dirname(f))
        acc.Reload()
        scalar_tags |= set(acc.Tags().get("scalars", []))
        try:
            if acc.PluginTagToContent("hparams"):
                found_session = True
        except KeyError:
            pass
    # per-epoch scalars (reference tensorboard.py Summary contract)
    assert any(t.startswith("loss/loss") for t in scalar_tags), scalar_tags
    assert any(
        "single_trial_correlation" in t for t in scalar_tags
    ), scalar_tags
    # the HParams plugin session row was written (train.py:242 ->
    # Summary.hparams -> add_hparams)
    assert found_session, scalar_tags
    # add_hparams mirrors the metrics dict as scalars in the session dir
    assert any(
        "best_val_correlation" in t or "test_correlation" in t
        for t in scalar_tags
    ), scalar_tags
