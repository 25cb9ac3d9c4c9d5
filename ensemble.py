"""Ensemble trained models and generate submissions — TPU-native rebuild of
the reference CLI (reference ensemble.py:241-543).

Modes (reference ensemble.py:31-83): 0 average the sub-model outputs /
1 shared Linear over the model axis / 2 per-mouse Linear. With ``--train``
(modes 1/2) only the output head is fitted; checkpoints store just the
output_module (scheduler module_names filter, reference ensemble.py:333).
"""

from __future__ import annotations

import argparse
import os
import shutil
import time
from datetime import datetime

import numpy as np

import submission as submission_lib
from v1t_tpu import training
from v1t_tpu.configs import Config, save_args
from v1t_tpu.data import get_mouse_ids, get_submission_ds, get_training_ds
from v1t_tpu.models.ensemble import build_ensemble, ensemble_regularizer
from v1t_tpu.utils.logger import Logger
from v1t_tpu.utils.scheduler import Scheduler
from v1t_tpu.utils.tensorboard import Summary


def fit_ensemble(config, trainer, scheduler, train_ds, val_ds, test_ds):
    """Output-head-only training loop (reference ensemble.py:154-239)."""
    summary = Summary(config)
    epoch, trainer.params, trainer.opt_state = scheduler.restore(
        trainer.params, trainer.opt_state
    )
    while (epoch := epoch + 1) < config.epochs + 1:
        if config.verbose:
            print(f"\nEpoch {epoch:03d}/{config.epochs:03d}")
        start = time.time()
        train_result = training.train_epoch(
            trainer, ds=train_ds, epoch=epoch, summary=summary
        )
        val_result = training.validate(
            trainer, ds=val_ds, epoch=epoch, summary=summary
        )
        elapse = time.time() - start
        summary.scalar("model/elapse", value=elapse, step=epoch, mode=0)
        if config.verbose:
            print(
                f'Train\t\tloss: {train_result["loss"]:.04f}\n'
                f'Validation\tloss: {val_result["loss"]:.04f}\t'
                f'correlation: {val_result["single_trial_correlation"]:.04f}\n'
                f"Elapse: {elapse:.02f}s"
            )
        early_stop, trainer.params, trainer.opt_state = scheduler.step(
            val_result["single_trial_correlation"],
            epoch=epoch,
            params=trainer.params,
            opt_state=trainer.opt_state,
            model_state=trainer.model_state,
        )
        if np.isnan(train_result["loss"]) or np.isnan(val_result["loss"]):
            exit("\nNaN loss detected, terminate training.")
        if early_stop:
            break

    training.restore_best(scheduler, trainer)
    training.evaluate(
        config, trainer, ds=test_ds, epoch=epoch, summary=summary, mode=2,
        print_result=True, save_result=config.output_dir,
    )


def main(config: Config, saved_models: dict):
    if config.clear_output_dir and os.path.isdir(config.output_dir):
        shutil.rmtree(config.output_dir)
    os.makedirs(config.output_dir, exist_ok=True)

    Logger(config.output_dir)
    get_mouse_ids(config)
    config.micro_batch_size = config.batch_size

    train_ds, val_ds, test_ds, card = get_training_ds(
        config,
        data_dir=config.dataset,
        mouse_ids=config.mouse_ids,
        batch_size=config.batch_size,
    )

    model, params, model_state = build_ensemble(config, saved_models, card)
    trainer = training.Trainer(
        config, model, params, card,
        model_state=model_state,
        regularizer_fn=ensemble_regularizer,
        trainable_modules=["output_module"],
        weight_decay=config.weight_decay,
    )
    save_args(config)

    if config.ensemble_mode == 0 and config.train:
        print("Cannot train ensemble model with average outputs")

    if config.ensemble_mode:
        scheduler = Scheduler(config, mode="max", module_names=["output_module"])
        if config.train:
            fit_ensemble(config, trainer, scheduler, train_ds, val_ds, test_ds)
        else:
            training.restore_best(scheduler, trainer)
    else:
        val_result = training.validate(trainer, ds=val_ds, epoch=0)
        if config.verbose:
            print(
                f'Validation\t\tloss: {val_result["loss"]:.04f}\t\t'
                f'correlation: {val_result["single_trial_correlation"]:.04f}\n'
            )

    sub_test_ds, final_test_ds = get_submission_ds(
        config, data_dir=config.dataset, batch_size=config.batch_size
    )
    timestamp = f"{datetime.now():%Y-%m-%d-%Hh%Mm}"
    csv_dir = os.path.join(config.output_dir, "submissions", timestamp)
    os.makedirs(csv_dir, exist_ok=True)

    training.evaluate(
        config, trainer, ds=sub_test_ds, print_result=True, save_result=csv_dir
    )

    if "sensorium" in config.dataset:
        if "S0" in sub_test_ds:
            submission_lib.generate_submission(
                trainer, mouse_id="S0", test_ds=sub_test_ds,
                final_test_ds=final_test_ds,
                csv_dir=os.path.join(csv_dir, "sensorium"),
            )
        if "S1" in sub_test_ds:
            submission_lib.generate_submission(
                trainer, mouse_id="S1", test_ds=sub_test_ds,
                final_test_ds=final_test_ds,
                csv_dir=os.path.join(csv_dir, "sensorium+"),
            )

    print(f"\nSubmission results saved to {csv_dir}.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="data/sensorium")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--mouse_ids", nargs="+", type=str, default=None)
    parser.add_argument("--behavior_mode", required=True, type=int,
                        choices=[0, 1, 2, 3, 4])
    parser.add_argument(
        "--saved_models", nargs="+", type=str, required=True,
        help="run directories of the trained models to ensemble "
             "(name=path or just path)",
    )
    parser.add_argument("--ensemble_mode", type=int, default=0, choices=[0, 1, 2])
    parser.add_argument("--train", action="store_true",
                        help="train the ensemble output head")
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--core_lr", type=float, default=None)
    parser.add_argument("--weight_decay", type=float, default=0.01)
    parser.add_argument("--adam_beta1", type=float, default=0.9)
    parser.add_argument("--adam_beta2", type=float, default=0.9999)
    parser.add_argument("--adam_eps", type=float, default=1e-8)
    parser.add_argument("--criterion", type=str, default="poisson")
    parser.add_argument("--ds_scale", type=int, default=1, choices=[0, 1])
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--precision", type=str, default="bf16",
                        choices=["bf16", "fp32"])
    parser.add_argument("--attention_impl", type=str, default="auto")
    parser.add_argument("--gray_scale", action="store_true")
    parser.add_argument("--resize_image", type=int, default=1, choices=[0, 1])
    parser.add_argument("--clear_output_dir", action="store_true")
    parser.add_argument("--verbose", type=int, default=1, choices=[0, 1, 2, 3])
    args = parser.parse_args()

    saved = {}
    for i, item in enumerate(args.saved_models):
        if "=" in item:
            name, path = item.split("=", 1)
        else:
            name, path = f"model{i}", item
        saved[name] = path

    import dataclasses

    known = {f.name for f in dataclasses.fields(Config)}
    kwargs = {k: v for k, v in vars(args).items() if k in known and v is not None}
    main(Config(**kwargs), saved_models=saved)
