"""PCA of core latent outputs vs behavior state — rebuild of reference
misc/core_pca.py: run the core over the test set, PCA the flattened feature
maps, and correlate the leading components with the behavior variables."""


from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from v1t_tpu import losses
from v1t_tpu.configs import load_args
from v1t_tpu.data import get_training_ds
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model_variables
from v1t_tpu.utils.scheduler import Scheduler


def main(args):
    config = load_args(args.output_dir)
    config.verbose = 0
    _, _, test_ds, card = get_training_ds(
        config, data_dir=config.dataset, mouse_ids=config.mouse_ids,
        batch_size=args.batch_size,
    )
    model = build_model(config, card)
    params, model_state = init_model_variables(model, seed=config.seed)
    scheduler = Scheduler(config, save_optimizer=False)
    _, params, _, model_state = scheduler.restore(
        params, None, model_state, force=True
    )
    state = model_state or {}

    results = {}
    for mouse_id, loader in test_ds.items():

        @jax.jit
        def step(params, images, behaviors, pupils):
            cropped, _ = model.apply(
                {"params": params, **state}, images, mouse_id=mouse_id,
                behaviors=behaviors, pupil_centers=pupils, method="crop",
            )
            return model.apply(
                {"params": params, **state}, cropped, mouse_id=mouse_id,
                behaviors=behaviors, pupil_centers=pupils,
                method="core_forward",
            )

        feats, behaviors = [], []
        for batch in loader:
            out = step(
                params,
                jnp.asarray(batch["image"]),
                jnp.asarray(batch["behavior"]),
                jnp.asarray(batch["pupil_center"]),
            )
            feats.append(np.asarray(out).reshape(len(out), -1))
            behaviors.append(batch["behavior"])
        feats = np.vstack(feats)
        behaviors = np.vstack(behaviors)

        # PCA via SVD on centered features
        centered = feats - feats.mean(0, keepdims=True)
        _, _, vt = np.linalg.svd(centered, full_matrices=False)
        components = centered @ vt[: args.num_components].T  # (T, k)

        corr = np.zeros((args.num_components, behaviors.shape[1]), np.float32)
        for i in range(args.num_components):
            for j in range(behaviors.shape[1]):
                corr[i, j] = losses.correlation(
                    components[:, i], behaviors[:, j], dim=0
                )
        results[mouse_id] = {"components": components, "behavior_corr": corr}
        print(f"Mouse {mouse_id} PC-behavior |corr| max: {np.abs(corr).max():.3f}")

    out = os.path.join(args.output_dir, "core_pca.pkl")
    with open(out, "wb") as f:
        pickle.dump(results, f)
    print(f"Saved {out}.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--num_components", type=int, default=5)
    main(parser.parse_args())
