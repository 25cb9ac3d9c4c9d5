"""Hyperparameter sweep driver — rebuild of reference sweep.py:12-87.

Two modes:
- wandb sweep agent (like the reference): ``--sweep_id <id>`` runs
  ``wandb.agent`` and builds a Config from the sweep config + tuned defaults.
- local random search (new; works without network): ``--space <json>`` with
  {param: [choices...]} samples ``--count`` configs and trains each.
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


def run_wandb_sweep(args):
    import wandb

    defaults = base_config(args)

    def sweep_train():
        run = wandb.init()
        overrides = dict(run.config)
        output_dir = os.path.join(args.output_dir, run.id)
        config = make_config(defaults, overrides, output_dir)
        config.use_wandb = True
        train_cli.main(config, wandb_sweep=True)

    wandb.agent(args.sweep_id, function=sweep_train, count=args.count)


def run_local_search(args):
    with open(args.space) as f:
        space = json.load(f)
    rng = np.random.default_rng(args.seed)
    defaults = base_config(args)
    results = []
    for trial in range(args.count):
        overrides = {k: rng.choice(v).item() if isinstance(v, list) else v
                     for k, v in space.items()}
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

    if args.sweep_id:
        run_wandb_sweep(args)
    elif args.space:
        run_local_search(args)
    else:
        raise SystemExit("provide --sweep_id (wandb) or --space (local search)")
