"""BehaviorMLP latent activations over the test set — rebuild of reference
misc/behaviorMLP_visualization.py (which forward-hooks the BehaviorMLPs);
here the latents are recomputed directly from the parameters."""


from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


import argparse
import os
import pickle

import jax.numpy as jnp
import numpy as np

from v1t_tpu.configs import load_args
from v1t_tpu.data import get_training_ds
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model_variables
from v1t_tpu.utils.scheduler import Scheduler


def bmlp_latent(block_params: dict, behaviors: np.ndarray, name: str):
    """Dense->tanh->Dense->tanh with the stored parameters."""
    x = jnp.asarray(behaviors)
    fc1 = block_params[f"{name}_fc1"]
    x = jnp.tanh(x @ fc1["kernel"] + fc1.get("bias", 0.0))
    fc2 = block_params[f"{name}_fc2"]
    return np.asarray(jnp.tanh(x @ fc2["kernel"] + fc2.get("bias", 0.0)))


def main(args):
    config = load_args(args.output_dir)
    config.verbose = 0
    assert config.core in ("vit", "cct"), "BehaviorMLP only exists in vit/cct"
    assert config.behavior_mode in (2, 3, 4)
    _, _, test_ds, card = get_training_ds(
        config, data_dir=config.dataset, mouse_ids=config.mouse_ids,
        batch_size=args.batch_size,
    )
    model = build_model(config, card)
    params, model_state = init_model_variables(model, seed=config.seed)
    scheduler = Scheduler(config, save_optimizer=False)
    _, params, _, _ = scheduler.restore(params, None, model_state, force=True)

    results = {}
    for mouse_id, loader in test_ds.items():
        behaviors = np.vstack([b["behavior"] for b in loader])
        pupils = np.vstack(
            [b["pupil_center"] for b in loader]
        )
        inputs = behaviors
        if config.behavior_mode in (3, 4):
            inputs = np.concatenate([behaviors, pupils], axis=1)
        name = mouse_id if config.behavior_mode == 4 else "share"
        latents = {}
        core = params["core"]["transformer"] if config.core == "vit" else params["core"]
        for i in range(config.num_blocks):
            if config.core == "vit":
                block = core[f"block{i}_bmlp"]
            else:
                block = core[f"block{i}"]["b_mlp"]
            latents[f"block{i}"] = bmlp_latent(block, inputs, name)
        results[mouse_id] = {"behaviors": behaviors, "latents": latents}

    out = os.path.join(args.output_dir, "behavior_mlp_latents.pkl")
    with open(out, "wb") as f:
        pickle.dump(results, f)
    print(f"Saved {out}.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=16)
    main(parser.parse_args())
