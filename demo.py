"""Demo: restore a trained run, evaluate the test set with the challenge
metrics, and extract attention-rollout visualizations — the script equivalent
of the reference's demo.ipynb (cells 1-13).

    python demo.py --output_dir runs/v1t [--num_maps 8]
"""

from __future__ import annotations

import argparse
import os
import pickle

from v1t_tpu import training
from v1t_tpu.analysis import extract_attention_maps
from v1t_tpu.configs import load_args
from v1t_tpu.data import get_training_ds
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model_variables
from v1t_tpu.utils.scheduler import Scheduler


def main(args):
    config = load_args(args.output_dir)
    config.verbose = 1
    config.attention_impl = "xla"  # probability export for rollout

    _, val_ds, test_ds, card = get_training_ds(
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

    print("\n=== Challenge metrics (test set) ===")
    training.evaluate(config, trainer, ds=test_ds, print_result=True)

    if config.core in ("vit",):
        print("\n=== Attention rollout ===")
        mouse_id = list(val_ds.keys())[0]
        maps = extract_attention_maps(
            val_ds[mouse_id], model, params, model_state=model_state,
            num_samples=args.num_maps,
        )
        out = os.path.join(args.output_dir, "demo_attention_maps.pkl")
        with open(out, "wb") as f:
            pickle.dump(maps, f)
        print(f"Saved {args.num_maps} rollout maps to {out}.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--num_maps", type=int, default=8)
    main(parser.parse_args())
