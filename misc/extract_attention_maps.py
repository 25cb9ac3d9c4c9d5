"""Extract attention-rollout maps for every mouse over validation + test sets
and pickle the results — rebuild of reference misc/extract_attention_maps.py.
"""


from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


import argparse
import os
import pickle

from v1t_tpu.analysis import extract_attention_maps
from v1t_tpu.configs import load_args
from v1t_tpu.data import get_training_ds
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model_variables
from v1t_tpu.utils.scheduler import Scheduler


def main(args):
    config = load_args(args.output_dir)
    config.verbose = args.verbose
    config.attention_impl = "xla"  # probability export path
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

    results = {}
    for tier, ds in [("validation", val_ds), ("test", test_ds)]:
        results[tier] = {}
        for mouse_id, loader in ds.items():
            print(f"Extract attention maps: {tier} mouse {mouse_id}")
            results[tier][mouse_id] = extract_attention_maps(
                loader, model, params, model_state=model_state,
                num_samples=args.num_samples, verbose=args.verbose,
            )

    filename = os.path.join(args.output_dir, "attention_maps.pkl")
    with open(filename, "wb") as f:
        pickle.dump(results, f)
    print(f"Saved attention maps to {filename}.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--num_samples", type=int, default=None)
    parser.add_argument("--verbose", type=int, default=1)
    main(parser.parse_args())
