"""Import a reference (PyTorch) V1T run into this framework.

Converts a reference run directory — ``args.yaml`` + ``ckpt/model_state.pt``
as written by the reference trainer (reference src/v1t/utils/scheduler.py:
84-102, src/v1t/utils/utils.py:280-289), including the published
bryanlimy/V1T HuggingFace checkpoints — into a run directory this
framework's tools can restore directly:

    <output_dir>/args.yaml                  translated typed Config
    <output_dir>/ckpt/model_state.msgpack   transplanted parameter tree
                                            (+ BatchNorm statistics for the
                                            stateful cores, + scheduler
                                            counters)

after which ``submission.py / ensemble.py / demo.py --output_dir <dir>``
work exactly as on a natively-trained run. The torch->JAX parameter mapping
is the canonical one in v1t_tpu/utils/torch_transplant.py (the same mapping
the cross-framework parity harness pins with forward/gradient equality
tests, tests/test_reference_parity.py).

Usage:
    python import_checkpoint.py --torch_dir <reference run dir> \
        --output_dir <new run dir> [--precision fp32]
"""

from __future__ import annotations

import argparse
import os
import re
import typing as t

import numpy as np
import yaml as pyyaml

from v1t_tpu.configs import Config, save_args
from v1t_tpu.data.cards import synthetic_data_card
from v1t_tpu.utils import torch_transplant
from v1t_tpu.utils.scheduler import CKPT_NAME, save_checkpoint_file


def load_torch_checkpoint(filename: str) -> dict:
    """Load the reference ``model_state.pt`` (torch pickle).

    Tries the restricted ``weights_only`` loader first; the reference
    checkpoint's scheduler dict may hold a ``torch.device``/argparse leftovers
    that older allowlists reject, in which case we fall back to the full
    unpickler — the same trust model as the reference's own
    ``torch.load`` (reference scheduler.py:122)."""
    import torch

    try:
        return torch.load(filename, map_location="cpu", weights_only=True)
    except Exception:
        return torch.load(filename, map_location="cpu", weights_only=False)


def _infer_mouse_ids(state_dict: dict) -> t.List[str]:
    """Recover the mouse list from per-mouse readout keys when the source
    args.yaml lacks ``mouse_ids`` (reference readout/readout.py:63-68 keys
    the ModuleDict by mouse_id)."""
    ids = []
    for key in state_dict:
        m = re.match(r"readouts\.([^.]+)\.", key)
        if m and m.group(1) not in ids:
            ids.append(m.group(1))
    return ids


def reference_args_to_config(
    payload: dict,
    output_dir: str,
    state_dict: t.Optional[dict] = None,
    overrides: t.Optional[dict] = None,
) -> Config:
    """Translate a reference ``args.yaml`` dict into a typed ``Config``.

    The CLI flag names were preserved in the rebuild (v1t_tpu/configs.py), so
    this is mostly a filtered copy plus the same normalizations the reference
    applies on replay (mouse_ids/output_shapes keys to str, reference
    utils/utils.py:297-305) and the removal of torch-only runtime fields."""
    import dataclasses

    known = {f.name for f in dataclasses.fields(Config)}
    kwargs = {k: v for k, v in payload.items() if k in known}
    # torch-only runtime selections must not leak into the JAX run
    kwargs["device"] = ""
    kwargs.pop("trainable_params", None)
    if overrides:
        kwargs.update(overrides)
    kwargs["output_dir"] = output_dir
    config = Config(**kwargs)
    if config.mouse_ids:
        config.mouse_ids = [str(m) for m in config.mouse_ids]
    elif state_dict is not None:
        config.mouse_ids = _infer_mouse_ids(state_dict)
    if config.output_shapes:
        config.output_shapes = {
            str(k): tuple(v) for k, v in config.output_shapes.items()
        }
    if config.input_shape is not None:
        config.input_shape = tuple(config.input_shape)
    return config


def _num_neurons(config: Config, params: dict) -> t.Dict[str, int]:
    if config.output_shapes:
        return {m: int(v[0]) for m, v in config.output_shapes.items()}
    # fall back to the transplanted feature-weight shapes
    out = {}
    for m in config.mouse_ids:
        r = params["readouts"][f"readout_{m}"]
        if "features" in r:  # gaussian2d: (1, C, N)
            out[m] = int(np.shape(r["features"])[-1])
        elif "fc2" in r:  # dense
            out[m] = int(np.shape(r["fc2"]["kernel"])[-1])
        else:  # linear
            out[m] = int(np.shape(r["linear"]["kernel"])[-1])
    return out


def validate_structure(config: Config, params: dict) -> bool:
    """Structural check of the transplanted tree against a freshly
    initialized model of the same Config — catches mapping drift before the
    checkpoint is written. Needs ``input_shape`` (recorded by every
    reference training run); returns False when it is unavailable."""
    if config.input_shape is None:
        return False
    from v1t_tpu.models import build_model
    from v1t_tpu.models.model import init_model

    neurons = _num_neurons(config, params)
    card = synthetic_data_card(
        mouse_ids=tuple(config.mouse_ids),
        num_neurons=[neurons[m] for m in config.mouse_ids],
        input_shape=tuple(config.input_shape),
        ds_name=config.ds_name or "sensorium",
    )
    model = build_model(config, card)
    init_params = init_model(model, seed=0)
    torch_transplant.assert_tree_shapes_match(params, init_params)
    return True


def convert_run(
    torch_dir: str,
    output_dir: str,
    overrides: t.Optional[dict] = None,
    validate: bool = True,
) -> dict:
    """Convert ``torch_dir`` (reference run) into ``output_dir`` (this
    framework's run-directory contract). Returns a summary dict."""
    args_file = os.path.join(torch_dir, "args.yaml")
    ckpt_file = os.path.join(torch_dir, "ckpt", "model_state.pt")
    if not os.path.isfile(ckpt_file):
        raise FileNotFoundError(f"no reference checkpoint at {ckpt_file}")
    payload: dict = {}
    if os.path.isfile(args_file):
        with open(args_file) as f:
            payload = pyyaml.safe_load(f) or {}
    ckpt = load_torch_checkpoint(ckpt_file)
    state_dict = ckpt["model"]

    config = reference_args_to_config(
        payload, output_dir, state_dict=state_dict, overrides=overrides
    )
    if not config.mouse_ids:
        raise ValueError(
            "could not determine mouse_ids from args.yaml or checkpoint keys"
        )

    params = torch_transplant.convert_state_dict(state_dict, config)
    model_state = torch_transplant.convert_batch_stats(state_dict, config)

    validated = False
    if validate:
        validated = validate_structure(config, params)

    epoch = int(ckpt.get("epoch", 0))
    value = float(ckpt.get("value", 0.0))
    out_ckpt = {"epoch": epoch, "value": value, "model": params}
    if model_state:
        out_ckpt["model_state"] = model_state
    # map the reference scheduler counters (reference scheduler.py:146-151)
    # so a resumed run keeps its plateau/early-stop position
    sched = ckpt.get("scheduler") or {}
    out_ckpt["scheduler"] = {
        "num_reduce": int(sched.get("num_reduce", 0)),
        "lr_wait": int(sched.get("lr_wait", 0)),
        "best_value": float(sched.get("best_value", value)),
        "best_epoch": epoch,
    }

    os.makedirs(output_dir, exist_ok=True)
    save_args(config)
    ckpt_path = os.path.join(output_dir, "ckpt", CKPT_NAME)
    save_checkpoint_file(ckpt_path, out_ckpt)

    leaves = []

    def _count(node):
        for v in node.values():
            if isinstance(v, dict):
                _count(v)
            else:
                leaves.append(int(np.size(v)))

    _count(params)
    return {
        "checkpoint": ckpt_path,
        "epoch": epoch,
        "value": value,
        "num_parameters": int(sum(leaves)),
        "mouse_ids": list(config.mouse_ids),
        "core": config.core,
        "readout": config.readout,
        "structurally_validated": validated,
        "has_batch_stats": bool(model_state),
    }


def main(args):
    overrides = {}
    if args.precision:
        overrides["precision"] = args.precision
    summary = convert_run(
        torch_dir=args.torch_dir,
        output_dir=args.output_dir,
        overrides=overrides,
        validate=not args.no_validate,
    )
    print("Imported reference checkpoint:")
    for k, v in summary.items():
        print(f"  {k}: {v}")
    if not summary["structurally_validated"] and not args.no_validate:
        print(
            "  note: structural validation skipped (no input_shape in the "
            "source args.yaml) — the tree was converted but not checked "
            "against a freshly initialized model."
        )
    print(
        f"\nRun e.g.: python submission.py --output_dir {args.output_dir} "
        f"--dataset <data dir>"
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Import a reference torch V1T run directory"
    )
    parser.add_argument(
        "--torch_dir", type=str, required=True,
        help="reference run directory holding args.yaml + ckpt/model_state.pt",
    )
    parser.add_argument(
        "--output_dir", type=str, required=True,
        help="destination run directory for this framework",
    )
    parser.add_argument(
        "--precision", type=str, default="",
        help="override compute precision for the imported run "
        "(e.g. fp32 for strict parity evaluation)",
    )
    parser.add_argument(
        "--no_validate", action="store_true",
        help="skip the structural check against a freshly initialized model",
    )
    main(parser.parse_args())
