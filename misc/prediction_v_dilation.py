"""Prediction quality vs pupil dilation — rebuild of reference
misc/prediction_v_dilation.py:24-60: compute single-trial correlation within
the top- and bottom-third pupil-dilation trials of each mouse's test set."""


from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


import argparse
import pickle
import os

import numpy as np

from v1t_tpu import losses, training
from v1t_tpu.configs import load_args
from v1t_tpu.data import get_training_ds
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model_variables
from v1t_tpu.utils.scheduler import Scheduler


def main(args):
    config = load_args(args.output_dir)
    config.verbose = 0
    train_ds, val_ds, test_ds, card = get_training_ds(
        config, data_dir=config.dataset, mouse_ids=config.mouse_ids,
        batch_size=args.batch_size,
    )
    model = build_model(config, card)
    params, model_state = init_model_variables(model, seed=config.seed)
    scheduler = Scheduler(config, save_optimizer=False)
    _, params, _, model_state = scheduler.restore(
        params, None, model_state, force=True
    )
    trainer = training.Trainer(config, model, params, card,
                               model_state=model_state)

    results = {}
    for mouse_id, loader in test_ds.items():
        targets, predictions, dilations = [], [], []
        for batch in loader:
            predictions.append(trainer.predict(mouse_id, batch))
            targets.append(batch["response"])
            # behavior = (pupil size, dpupil/dt, speed); dilation is index 1
            dilations.append(batch["behavior"][:, 1])
        targets = np.vstack(targets)
        predictions = np.vstack(predictions)
        dilations = np.concatenate(dilations)

        order = np.argsort(dilations)
        third = len(order) // 3
        low, high = order[:third], order[-third:]
        corr = lambda idx: float(
            np.mean(losses.correlation(predictions[idx], targets[idx], dim=0))
        )
        results[mouse_id] = {
            "low_dilation_correlation": corr(low),
            "high_dilation_correlation": corr(high),
            "overall_correlation": corr(np.arange(len(order))),
        }
        print(f"Mouse {mouse_id}: {results[mouse_id]}")

    out = os.path.join(args.output_dir, "prediction_v_dilation.pkl")
    with open(out, "wb") as f:
        pickle.dump(results, f)
    print(f"Saved {out}.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=16)
    main(parser.parse_args())
