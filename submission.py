"""Generate Sensorium / Sensorium+ submission CSVs from a trained run —
TPU-native rebuild of the reference CLI (reference submission.py).

Restores the run via args.yaml replay + best checkpoint, evaluates the live
test set, then writes live_test.csv / final_test.csv per challenge with
columns (trial_indices, image_ids, prediction, neuron_ids). Note: the
predictions are **standardized responses** (per-neuron precision-scaled),
matching the challenge ground-truth format (reference submission.py:44-46).
"""

from __future__ import annotations

import argparse
import os
import typing as t
from datetime import datetime

import numpy as np
import pandas as pd

from v1t_tpu import training
from v1t_tpu.configs import load_args
from v1t_tpu.data import get_submission_ds
from v1t_tpu.data.loaders import BatchLoader, build_data_card
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model_variables
from v1t_tpu.utils.scheduler import Scheduler


def save_csv(filename: str, results: t.Dict[str, list]):
    os.makedirs(os.path.dirname(filename), exist_ok=True)
    df = pd.DataFrame(
        {
            "trial_indices": results["trial_ids"],
            "image_ids": results["image_ids"],
            "prediction": results["predictions"],
            "neuron_ids": results["neuron_ids"],
        }
    )
    df.to_csv(filename, index=False)
    print(f"Saved submission file {filename}.")


def submission_inference(
    trainer: training.Trainer, loader: BatchLoader, mouse_id: str
) -> t.Dict[str, list]:
    """Per-trial predictions as python lists for the CSV
    (reference submission.py:33-77)."""
    results = {"predictions": [], "image_ids": [], "trial_ids": []}
    for batch in loader:
        predictions = trainer.predict(mouse_id, batch)
        results["predictions"].extend(predictions.tolist())
        results["image_ids"].extend(np.asarray(batch["image_id"]).tolist())
        results["trial_ids"].extend(np.asarray(batch["trial_id"]).tolist())
    results["neuron_ids"] = np.repeat(
        loader.dataset.neuron_ids[None], repeats=len(results["predictions"]), axis=0
    ).tolist()
    return results


def generate_submission(
    trainer: training.Trainer,
    mouse_id: str,
    test_ds: dict,
    final_test_ds: dict,
    csv_dir: str,
):
    print(f"\nGenerate results for Mouse {mouse_id}")
    save_csv(
        filename=os.path.join(csv_dir, "live_test.csv"),
        results=submission_inference(trainer, test_ds[mouse_id], mouse_id),
    )
    save_csv(
        filename=os.path.join(csv_dir, "final_test.csv"),
        results=submission_inference(trainer, final_test_ds[mouse_id], mouse_id),
    )


def main(args):
    if not os.path.isdir(args.output_dir):
        raise FileNotFoundError(f"Cannot find {args.output_dir}.")

    overrides = {"batch_size": args.batch_size, "verbose": args.verbose}
    if args.dataset:
        overrides["dataset"] = args.dataset
    config = load_args(args.output_dir, overrides=overrides)
    if not config.ds_name:
        config.ds_name = os.path.basename(os.path.normpath(config.dataset))
    assert config.ds_name == "sensorium"

    for mouse_id in ("S0", "S1"):
        if mouse_id not in config.output_shapes:
            print(f"Warning: the saved model was not trained on Mouse {mouse_id}")

    test_ds, final_test_ds = get_submission_ds(
        config, data_dir=config.dataset, batch_size=config.batch_size
    )
    card = build_data_card(config, test_ds)
    # ds_sizes in the card refer to the test loaders here; criterion scaling
    # is unused at inference time
    model = build_model(config, card)
    params, model_state = init_model_variables(model, seed=config.seed)

    scheduler = Scheduler(config, save_optimizer=False)
    _, params, _, model_state = scheduler.restore(
        params, None, model_state, force=True
    )
    trainer = training.Trainer(config, model, params, card,
                               model_state=model_state)

    timestamp = f"{datetime.now():%Y-%m-%d-%Hh%Mm}"
    csv_dir = os.path.join(config.output_dir, "submissions", timestamp)
    os.makedirs(csv_dir, exist_ok=True)

    training.evaluate(
        config, trainer, ds=test_ds, print_result=True, save_result=csv_dir
    )

    if "S0" in test_ds:
        generate_submission(
            trainer, mouse_id="S0", test_ds=test_ds, final_test_ds=final_test_ds,
            csv_dir=os.path.join(csv_dir, "sensorium"),
        )
    if "S1" in test_ds:
        generate_submission(
            trainer, mouse_id="S1", test_ds=test_ds, final_test_ds=final_test_ds,
            csv_dir=os.path.join(csv_dir, "sensorium+"),
        )

    print(f"\nSubmission results saved to {csv_dir}.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=False, default=None)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--batch_size", default=16, type=int)
    parser.add_argument("--device", type=str, default="",
                        choices=["", "cpu", "tpu", "axon"])
    parser.add_argument("--verbose", type=int, default=2, choices=[0, 1, 2, 3])
    main(parser.parse_args())
