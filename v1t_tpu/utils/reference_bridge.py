"""Bridge for driving the ACTUAL reference implementation side by side with
this framework.

Three capabilities, all used by the cross-framework validation harnesses
(tests/test_reference_parity.py, tests/test_convergence_ab.py,
tests/test_checkpoint_import.py, misc/convergence_ab.py):

1. ``install_stubs()`` — the image lacks torchvision/torchinfo/wandb; stub
   the exact call surfaces the reference touches so its unmodified code runs.
2. ``build_reference_model(cfg, card)`` — construct the reference torch
   ``Model`` (reference src/v1t/models/model.py:50-105) from this
   framework's typed Config + DataCard.
3. ``run_reference_training(...)`` — run the reference's OWN training stack
   end to end on an on-disk fixture: its data pipeline
   (data.get_training_ds, reference data.py:437-491), its train/validate
   epoch functions (reference train.py:84-190), its Scheduler state machine
   with plateau rollback (reference scheduler.py:173-197) writing its own
   ``ckpt/model_state.pt``, and its ``utils.evaluate`` + ``save_args`` — so
   downstream tests ingest artifacts produced entirely by reference code,
   and convergence trajectories come from the real reference loop.

Nothing here is imported by the framework's production paths.
"""

from __future__ import annotations

import os
import sys
import types
import typing as t

import numpy as np

REFERENCE_SRC = "/root/reference/src"


def install_stubs():
    """Stub torchvision/torchinfo/wandb and alias legacy matplotlib style
    names — the minimal shims that let the unmodified reference code run on
    this image (no network, no torchvision wheel)."""
    import torch

    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            import torch.nn.functional as F

            tv = types.ModuleType("torchvision")
            transforms = types.ModuleType("torchvision.transforms")

            class Resize:
                def __init__(self, size, antialias=None):
                    self.size = tuple(size)
                    self.antialias = bool(antialias)

                def __call__(self, x):
                    return F.interpolate(
                        x, size=self.size, mode="bilinear",
                        align_corners=False, antialias=self.antialias,
                    )

            transforms.Resize = Resize

            # torchvision.transforms.functional.resize (used by the
            # reference attention_rollout.py:8,121 with antialias=False)
            functional = types.ModuleType(
                "torchvision.transforms.functional"
            )

            def resize(img, size, antialias=None):
                x = img
                unsqueeze = x.dim() == 3
                if unsqueeze:
                    x = x[None]
                out = F.interpolate(
                    x, size=tuple(size), mode="bilinear",
                    align_corners=False, antialias=bool(antialias),
                )
                return out[0] if unsqueeze else out

            functional.resize = resize
            transforms.functional = functional
            tv.transforms = transforms
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = transforms
            sys.modules["torchvision.transforms.functional"] = functional

    if "torchinfo" not in sys.modules:
        try:
            import torchinfo  # noqa: F401
        except ImportError:
            ti = types.ModuleType("torchinfo")
            ti.summary = lambda *a, **k: types.SimpleNamespace(
                trainable_params=0
            )
            sys.modules["torchinfo"] = ti

    if "wandb" not in sys.modules:
        try:
            import wandb  # noqa: F401
        except ImportError:
            wb = types.ModuleType("wandb")
            wb.init = lambda *a, **k: None
            wb.log = lambda *a, **k: None
            wb.finish = lambda *a, **k: None
            wb.config = types.SimpleNamespace()
            sys.modules["wandb"] = wb

    if "ruamel" not in sys.modules:
        try:
            import ruamel.yaml  # noqa: F401
        except ImportError:
            import yaml as _pyyaml

            ruamel = types.ModuleType("ruamel")
            ry = types.ModuleType("ruamel.yaml")

            def _sanitize(obj):
                # the reference's save_args stores raw subprocess bytes
                # (git_hash/hostname, reference utils/utils.py:283-285)
                if isinstance(obj, bytes):
                    return obj.decode("utf-8", "replace").strip()
                if isinstance(obj, dict):
                    return {k: _sanitize(v) for k, v in obj.items()}
                if isinstance(obj, (list, tuple)):
                    return [_sanitize(v) for v in obj]
                return obj

            class YAML:
                def __init__(self, typ="safe"):
                    del typ

                def load(self, stream):
                    return _pyyaml.safe_load(stream)

                def dump(self, data, stream):
                    _pyyaml.safe_dump(
                        _sanitize(data), stream, default_flow_style=False
                    )

            ry.YAML = YAML
            ruamel.yaml = ry
            sys.modules["ruamel"] = ruamel
            sys.modules["ruamel.yaml"] = ry

    # torch >= 2.6 defaults torch.load to weights_only=True, which rejects
    # the reference's own checkpoints: its Scheduler.state_dict() pickles
    # the live GradScaler object and torch.device (reference
    # scheduler.py:153-158). Allowlist exactly those so the unmodified
    # reference restore path (scheduler.py:122-123) keeps working.
    try:
        import torch.serialization as _ts

        _safe = [torch.device]
        try:
            from torch.amp.grad_scaler import GradScaler as _GS

            _safe.append(_GS)
        except ImportError:
            pass
        try:
            from torch.cuda.amp.grad_scaler import GradScaler as _GS2

            _safe.append(_GS2)
        except ImportError:
            pass
        # numpy scalars ride along in the scheduler state (best_value from
        # np.mean) — allowlist the reconstruction callables torch flags
        _safe.append(np.dtype)
        for _mod_name, _attr in (
            ("numpy._core.multiarray", "scalar"),
            ("numpy.core.multiarray", "scalar"),
        ):
            try:
                _mod = __import__(_mod_name, fromlist=[_attr])
                _safe.append(getattr(_mod, _attr))
            except (ImportError, AttributeError):
                pass
        try:
            import numpy.dtypes as _npdt

            _safe.extend(
                v for v in vars(_npdt).values()
                if isinstance(v, type) and v.__name__.endswith("DType")
            )
        except ImportError:
            pass
        _ts.add_safe_globals(_safe)
    except Exception:
        pass

    # the reference's tensorboard module uses the pre-3.6 matplotlib style
    # name at import time — alias it so the import chain succeeds
    import matplotlib.style

    lib = matplotlib.style.library
    for name in list(lib):
        legacy = name.replace("seaborn-v0_8", "seaborn")
        if legacy not in lib:
            lib[legacy] = lib[name]


def reference_on_path():
    install_stubs()
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)


def make_reference_args(cfg, **overrides) -> types.SimpleNamespace:
    """The full argparse-blackboard surface (reference train.py:328-661 +
    the fields data.py/model.py/scheduler.py mutate or read) from a typed
    Config. ``overrides`` supplies run-specific fields (dataset,
    output_dir, ...)."""
    import torch

    args = types.SimpleNamespace(
        # data
        dataset="", ds_name="sensorium", mouse_ids=None, behavior_mode=cfg.behavior_mode,
        gray_scale=getattr(cfg, "gray_scale", False), limit_data=None,
        num_workers=0, micro_batch_size=0, batch_size=cfg.batch_size,
        # model
        core=cfg.core, readout=cfg.readout, shift_mode=cfg.shift_mode,
        center_crop=cfg.center_crop, resize_image=cfg.resize_image,
        patch_mode=cfg.patch_mode, patch_size=cfg.patch_size,
        patch_stride=cfg.patch_stride, emb_dim=cfg.emb_dim,
        num_blocks=cfg.num_blocks, num_heads=cfg.num_heads,
        mlp_dim=cfg.mlp_dim, p_dropout=cfg.p_dropout,
        t_dropout=cfg.t_dropout, drop_path=cfg.drop_path,
        use_lsa=cfg.use_lsa, disable_bias=cfg.disable_bias,
        grad_checkpointing=False, bias_mode=cfg.bias_mode,
        disable_grid_predictor=cfg.disable_grid_predictor,
        grid_predictor_dim=cfg.grid_predictor_dim,
        pretrain_core="",
        # regularizers
        core_reg_scale=cfg.core_reg_scale,
        readout_reg_scale=cfg.readout_reg_scale,
        cropper_reg_scale=0.0, shifter_reg_scale=0.0,
        # optimization
        epochs=cfg.epochs, lr=cfg.lr, core_lr=cfg.core_lr or cfg.lr,
        adam_beta1=cfg.adam_beta1, adam_beta2=cfg.adam_beta2,
        adam_eps=cfg.adam_eps, criterion=cfg.criterion,
        ds_scale=cfg.ds_scale, crop_mode=1,
        # runtime
        device=torch.device("cpu"), seed=cfg.seed, deterministic=False,
        amp=False, backend=None, verbose=0, use_wandb=False,
        clear_output_dir=False, save_plots=False, dpi=78, format="svg",
        # secondary-core fields some registries read
        pos_emb=getattr(cfg, "pos_emb", "sine"),
        num_layers=getattr(cfg, "num_layers", 4),
        num_filters=getattr(cfg, "num_filters", 8),
        dropout=getattr(cfg, "dropout", 0.0),
        core_reg_input=getattr(cfg, "core_reg_input", 0.0),
        core_reg_hidden=getattr(cfg, "core_reg_hidden", 0.0),
        linear=False,
    )
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def build_reference_model(cfg, card):
    """Reference torch Model from a Config + DataCard (no on-disk data):
    the per-mouse readout statistics come from the card."""
    reference_on_path()
    import torch

    from v1t.models.model import Model as RefModel

    args = make_reference_args(cfg)
    args.output_shapes = {
        m: (card.neuron_cards[m].num_neurons,) for m in card.mouse_ids
    }
    args.input_shape = tuple(card.input_shape)
    args.ds_name = card.ds_name
    args.mouse_ids = list(card.mouse_ids)
    ds = {
        m: types.SimpleNamespace(
            dataset=types.SimpleNamespace(
                coordinates=np.asarray(
                    card.neuron_cards[m].coordinates, np.float32
                ),
                response_stats={
                    "mean": np.asarray(
                        card.neuron_cards[m].response_mean, np.float32
                    ),
                    "std": np.asarray(
                        card.neuron_cards[m].response_std, np.float32
                    ),
                },
            )
        )
        for m in card.mouse_ids
    }
    torch.manual_seed(cfg.seed)
    model = RefModel(args, ds=ds)
    model.eval()
    return model


class NoopSummary:
    """Quiet stand-in for the reference tensorboard.Summary — the epoch
    functions only call ``scalar``/``histogram``/``figure``/``image``."""

    def scalar(self, *a, **k):
        pass

    histogram = image = figure = scalar

    def close(self):
        pass


def run_reference_training(
    cfg,
    dataset_dir: str,
    output_dir: str,
    mouse_ids: t.Sequence[str],
    epochs: int,
    lr_patience: int = 10,
    max_reduce: int = 2,
    evaluate_test: bool = True,
    capture_init: bool = False,
) -> dict:
    """Train the ACTUAL reference on an on-disk fixture and return the run
    record. Mirrors reference train.py:193-304 (main) with its own
    data pipeline, Model, AdamW param groups, criterion, GradScaler(off on
    CPU) and Scheduler — every checkpoint/args.yaml artifact in
    ``output_dir`` is written by unmodified reference code.

    Returns {"val_corr": [...], "val_loss": [...], "train_loss": [...],
    "lr": [...], "reduce_epochs": [...], "best_epoch", "stopped_epoch",
    "eval": {...}, "output_dir"} (+ "init_state_dict" of numpy arrays when
    ``capture_init`` — transplant it into the JAX side via
    torch_transplant.convert_state_dict for identical-init trajectories).
    """
    reference_on_path()
    import torch
    from torch.cuda.amp import GradScaler

    # the epoch functions live in the repo-root train.py, importable once
    # /root/reference is on the path (it has no package __init__ collisions
    # with this repo's train.py because we import it under a distinct name)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "reference_train",
        os.path.join(os.path.dirname(REFERENCE_SRC), "train.py"),
    )
    ref_train = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_train)
    from v1t import data as ref_data
    from v1t import losses as ref_losses
    from v1t.models.model import Model as RefModel
    from v1t.utils import utils as ref_utils
    from v1t.utils.scheduler import Scheduler as RefScheduler

    os.makedirs(output_dir, exist_ok=True)
    args = make_reference_args(
        cfg, dataset=dataset_dir, output_dir=output_dir,
        mouse_ids=list(mouse_ids), epochs=epochs,
    )
    ref_utils.get_device(args)
    ref_utils.set_random_seed(args.seed, deterministic=args.deterministic)
    ref_data.get_mouse_ids(args)
    ref_utils.compute_micro_batch_size(args)

    train_ds, val_ds, test_ds = ref_data.get_training_ds(
        args, data_dir=args.dataset, mouse_ids=args.mouse_ids,
        batch_size=args.batch_size, device=args.device,
    )
    summary = NoopSummary()
    # Model directly (get_model only adds torchinfo summaries + pretrained
    # core handling, reference model.py:180-229)
    model = RefModel(args, ds=train_ds)
    optimizer = torch.optim.AdamW(
        params=model.get_parameters(core_lr=args.core_lr),
        lr=args.lr, betas=(args.adam_beta1, args.adam_beta2),
        eps=args.adam_eps, weight_decay=0,
    )
    criterion = ref_losses.get_criterion(args, ds=train_ds)
    scaler = GradScaler(enabled=False)
    scheduler = RefScheduler(
        args, model=model, optimizer=optimizer, scaler=scaler, mode="max",
        lr_patience=lr_patience, max_reduce=max_reduce,
    )
    ref_utils.save_args(args)

    record: dict = {
        "val_corr": [], "val_loss": [], "train_loss": [], "lr": [],
        "reduce_epochs": [], "best_epoch": 0, "stopped_epoch": 0,
        "output_dir": output_dir,
    }
    if capture_init:
        record["init_state_dict"] = {
            k: v.detach().cpu().numpy().copy()
            for k, v in model.state_dict().items()
        }
    epoch = 0
    while (epoch := epoch + 1) < args.epochs + 1:
        train_result = ref_train.train(
            args, ds=train_ds, model=model, optimizer=optimizer,
            criterion=criterion, scaler=scaler, epoch=epoch, summary=summary,
        )
        val_result = ref_train.validate(
            args, ds=val_ds, model=model, criterion=criterion,
            scaler=scaler, epoch=epoch, summary=summary,
        )
        before = scheduler.num_reduce
        early_stop = scheduler.step(
            val_result["single_trial_correlation"], epoch=epoch
        )
        record["val_corr"].append(float(val_result["single_trial_correlation"]))
        record["val_loss"].append(float(val_result["loss"]))
        record["train_loss"].append(float(train_result["loss"]))
        record["lr"].append(float(optimizer.param_groups[0]["lr"]))
        if scheduler.num_reduce > before:
            record["reduce_epochs"].append(epoch)
        if early_stop:
            break
    record["stopped_epoch"] = epoch
    record["best_epoch"] = int(getattr(scheduler, "best_epoch", 0))
    record["best_value"] = float(scheduler.best_value)

    scheduler.restore()
    if evaluate_test:
        eval_result = ref_utils.evaluate(
            args, ds=test_ds, model=model, epoch=epoch, summary=summary,
            mode=2, print_result=False, save_result=args.output_dir,
        )
        record["eval"] = {k: float(v) for k, v in eval_result.items()}
    return record


def load_reference_run(cfg, dataset_dir: str, output_dir: str,
                       mouse_ids: t.Sequence[str]):
    """Rebuild the reference model over the fixture's own data pipeline and
    restore its best checkpoint through the REFERENCE's Scheduler.restore
    (reference scheduler.py:104-144, force=True). Returns (model, epoch)."""
    reference_on_path()
    from v1t import data as ref_data
    from v1t.models.model import Model as RefModel
    from v1t.utils import utils as ref_utils
    from v1t.utils.scheduler import Scheduler as RefScheduler

    args = make_reference_args(
        cfg, dataset=dataset_dir, output_dir=output_dir,
        mouse_ids=list(mouse_ids),
    )
    ref_utils.get_device(args)
    ref_data.get_mouse_ids(args)
    train_ds, _, _ = ref_data.get_training_ds(
        args, data_dir=args.dataset, mouse_ids=args.mouse_ids,
        batch_size=args.batch_size, device=args.device,
    )
    model = RefModel(args, ds=train_ds)
    sched = RefScheduler(
        args, model=model, optimizer=None, save_optimizer=False, mode="max"
    )
    epoch = sched.restore(force=True)
    model.eval()
    return model, epoch


def run_jax_training(
    cfg,
    dataset_dir: str,
    output_dir: str,
    mouse_ids: t.Sequence[str],
    epochs: int,
    lr_patience: int = 10,
    max_reduce: int = 2,
    init_params=None,
    evaluate_test: bool = True,
) -> dict:
    """Train THIS framework on the same fixture with the same schedule —
    the exact building blocks of train.py's main loop (data pipeline,
    Trainer, Scheduler) with the trajectory recorded. ``init_params``
    (e.g. transplanted from the reference's initialization) overrides the
    native init so both sides start from identical weights."""
    import copy

    import jax

    from v1t_tpu import training
    from v1t_tpu.configs import save_args
    from v1t_tpu.data import get_mouse_ids, get_training_ds
    from v1t_tpu.models import build_model
    from v1t_tpu.models.model import init_model_variables
    from v1t_tpu.utils.scheduler import Scheduler

    cfg = copy.deepcopy(cfg)
    cfg.dataset = dataset_dir
    cfg.output_dir = output_dir
    cfg.mouse_ids = list(mouse_ids)
    cfg.epochs = epochs
    os.makedirs(output_dir, exist_ok=True)
    np.random.seed(cfg.seed)
    get_mouse_ids(cfg)
    train_ds, val_ds, test_ds, card = get_training_ds(
        cfg, data_dir=cfg.dataset, mouse_ids=cfg.mouse_ids,
        batch_size=cfg.batch_size,
    )
    model = build_model(cfg, card)
    params, model_state = init_model_variables(model, seed=cfg.seed)
    if init_params is not None:
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32), init_params
        )
    trainer = training.Trainer(
        cfg, model, params, card, model_state=model_state
    )
    scheduler = Scheduler(
        cfg, mode="max", lr_patience=lr_patience, max_reduce=max_reduce
    )
    save_args(cfg)

    record: dict = {
        "val_corr": [], "val_loss": [], "train_loss": [], "lr": [],
        "reduce_epochs": [], "best_epoch": 0, "stopped_epoch": 0,
        "output_dir": output_dir,
    }
    epoch = 0
    while (epoch := epoch + 1) < cfg.epochs + 1:
        train_result = training.train_epoch(trainer, ds=train_ds, epoch=epoch)
        val_result = training.validate(trainer, ds=val_ds, epoch=epoch)
        before = scheduler.num_reduce
        early_stop, trainer.params, trainer.opt_state = scheduler.step(
            val_result["single_trial_correlation"], epoch=epoch,
            params=trainer.params, opt_state=trainer.opt_state,
            model_state=trainer.model_state,
        )
        record["val_corr"].append(float(val_result["single_trial_correlation"]))
        record["val_loss"].append(float(val_result["loss"]))
        record["train_loss"].append(float(train_result["loss"]))
        from v1t_tpu import optim

        record["lr"].append(float(optim.get_learning_rates(
            trainer.opt_state)["core"]))
        if scheduler.num_reduce > before:
            record["reduce_epochs"].append(epoch)
        if early_stop:
            break
    record["stopped_epoch"] = epoch
    record["best_epoch"] = int(scheduler.best_epoch)
    record["best_value"] = float(scheduler.best_value)

    _, trainer.params, trainer.opt_state, trainer.model_state = (
        scheduler.restore(
            trainer.params, trainer.opt_state, trainer.model_state
        )
    )
    if evaluate_test:
        eval_result = training.evaluate(
            cfg, trainer, ds=test_ds, epoch=epoch, mode=2,
            print_result=False, save_result=cfg.output_dir,
        )
        record["eval"] = {
            k: float(v) for k, v in eval_result.items()
            if isinstance(v, (int, float))
        }
    return record
