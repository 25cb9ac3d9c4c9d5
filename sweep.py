"""Hyperparameter sweep driver — rebuild of reference sweep.py:12-87.

Modes:
- wandb sweep agent (like the reference): ``--sweep_id <id>`` runs
  ``wandb.agent``; or ``--sweep_config configs/sweep_v1t.yaml`` creates the
  sweep from the shipped spec (the paper's search space) and runs the agent.
- local random search (new; works without network): ``--local`` with
  ``--sweep_config`` samples from the same YAML space, or ``--space <json>``
  with {param: [choices...]}; trains ``--count`` configs.

Every trial also logs a TensorBoard HParams row (Summary.hparams) relating
the sampled hyperparameters to the final validation correlation.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np

import train as train_cli
from v1t_tpu.configs import Config


def base_config(args) -> dict:
    return dict(
        dataset=args.dataset,
        behavior_mode=args.behavior_mode,
        core=args.core,
        readout=args.readout,
        batch_size=args.batch_size,
        epochs=args.epochs,
        verbose=0,
        mouse_ids=args.mouse_ids,
        limit_data=args.limit_data,
    )


def make_config(defaults: dict, overrides: dict, output_dir: str) -> Config:
    known = {f.name for f in dataclasses.fields(Config)}
    kwargs = {k: v for k, v in {**defaults, **overrides}.items() if k in known}
    kwargs["output_dir"] = output_dir
    return Config(**kwargs)


def load_sweep_yaml(path: str) -> dict:
    import yaml as pyyaml

    with open(path) as f:
        return pyyaml.safe_load(f)


def sample_from_yaml_space(parameters: dict, rng) -> dict:
    """Draw one configuration from a wandb-style sweep ``parameters`` block
    (values lists, uniform/log_uniform_values/int_uniform distributions)."""
    overrides = {}
    for name, spec in parameters.items():
        if "values" in spec:
            overrides[name] = rng.choice(spec["values"]).item()
        elif "value" in spec:
            overrides[name] = spec["value"]
        else:
            lo, hi = spec["min"], spec["max"]
            dist = spec.get("distribution", "uniform")
            if dist == "int_uniform":
                overrides[name] = int(rng.integers(lo, hi + 1))
            elif dist in ("log_uniform_values", "log_uniform"):
                overrides[name] = float(
                    np.exp(rng.uniform(np.log(lo), np.log(hi)))
                )
            else:
                overrides[name] = float(rng.uniform(lo, hi))
    return overrides


def run_wandb_sweep(args):
    import wandb

    defaults = base_config(args)
    sweep_id = args.sweep_id
    if sweep_id is None and args.sweep_config:
        sweep_id = wandb.sweep(
            load_sweep_yaml(args.sweep_config), project="v1t_tpu"
        )
        print(f"Created sweep {sweep_id} from {args.sweep_config}")

    def sweep_train():
        run = wandb.init()
        overrides = dict(run.config)
        output_dir = os.path.join(args.output_dir, run.id)
        config = make_config(defaults, overrides, output_dir)
        config.use_wandb = True
        train_cli.main(config, wandb_sweep=True)

    wandb.agent(sweep_id, function=sweep_train, count=args.count)


def run_local_search(args):
    if args.space:
        with open(args.space) as f:
            raw = json.load(f)
        parameters = {
            k: (v if isinstance(v, dict) else {"values": v})
            for k, v in raw.items()
        }
    else:
        parameters = load_sweep_yaml(args.sweep_config)["parameters"]
    rng = np.random.default_rng(args.seed)
    defaults = base_config(args)
    results = []
    for trial in range(args.count):
        overrides = sample_from_yaml_space(parameters, rng)
        output_dir = os.path.join(args.output_dir, f"trial{trial:03d}")
        config = make_config(defaults, overrides, output_dir)
        print(f"\n=== Trial {trial}: {overrides} ===")
        result = train_cli.main(config)
        corr = result.get("single_trial_correlation", float("nan"))
        results.append({"trial": trial, "overrides": overrides,
                        "single_trial_correlation": float(corr)})
        with open(os.path.join(args.output_dir, "sweep_results.json"), "w") as f:
            json.dump(results, f, indent=2)
    best = max(results, key=lambda r: r["single_trial_correlation"])
    print(f"\nBest trial: {best}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--sweep_id", type=str, default=None,
                        help="wandb sweep id (wandb mode)")
    parser.add_argument("--sweep_config", type=str, default=None,
                        help="wandb sweep YAML (e.g. configs/sweep_v1t.yaml);"
                             " creates the sweep (wandb mode) or defines the"
                             " local search space with --local")
    parser.add_argument("--local", action="store_true",
                        help="random search locally over --sweep_config's "
                             "space (no wandb/network)")
    parser.add_argument("--space", type=str, default=None,
                        help="JSON file {param: [choices]} (local mode)")
    parser.add_argument("--count", type=int, default=10)
    parser.add_argument("--behavior_mode", type=int, default=3)
    parser.add_argument("--core", type=str, default="vit")
    parser.add_argument("--readout", type=str, default="gaussian2d")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--mouse_ids", nargs="+", type=str, default=None)
    parser.add_argument("--limit_data", type=int, default=None)
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args()

    if args.space or (args.local and args.sweep_config):
        run_local_search(args)
    elif args.sweep_id or args.sweep_config:
        run_wandb_sweep(args)
    else:
        raise SystemExit(
            "provide --sweep_id / --sweep_config (wandb) or "
            "--space / --local --sweep_config (local search)"
        )
