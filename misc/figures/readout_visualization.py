"""Readout-position figures (port of reference
misc/readout_visualization.ipynb): the Gaussian2d readout's learned
per-neuron grid positions (mu) over the core feature map, colored by the
neurons' anatomical coordinates.

Usage: python misc/figures/readout_visualization.py --output_dir <run>
Restores the run checkpoint (args.yaml replay) and plots every mouse.
"""

import argparse
import os

import numpy as np
import matplotlib.pyplot as plt

from _common import LABEL_FONTSIZE, TITLE_FONTSIZE, normalize, save_figure

from v1t_tpu.configs import load_args
from v1t_tpu.data import get_mouse_ids, get_training_ds
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model_variables
from v1t_tpu.utils.scheduler import Scheduler


def readout_mu(model, params, mouse_id: str) -> np.ndarray:
    """(N, 2) learned grid means in [-1, 1] for one mouse's readout."""
    import jax

    def mu_fn(p):
        def inner(mdl):
            return mdl.readouts.readouts[mouse_id].mu()

        return model.apply({"params": p}, method=inner)

    return np.asarray(jax.jit(mu_fn)(params)).reshape(-1, 2)


def main(args):
    config = load_args(args.output_dir)
    config.verbose = 0
    get_mouse_ids(config)
    _, _, _, card = get_training_ds(
        config, data_dir=config.dataset, mouse_ids=config.mouse_ids,
        batch_size=config.batch_size,
    )
    model = build_model(config, card)
    params, model_state = init_model_variables(model, seed=config.seed)
    scheduler = Scheduler(config, save_optimizer=False)
    _, params, _, model_state = scheduler.restore(
        params, None, model_state, force=True
    )

    mice = list(card.mouse_ids)
    figure, axes = plt.subplots(
        1, len(mice), figsize=(3.2 * len(mice), 2.6), dpi=240, squeeze=False
    )
    for axis, mouse_id in zip(axes[0], mice):
        mu = readout_mu(model, params, mouse_id)
        coords = np.asarray(card.neuron_cards[mouse_id].coordinates)
        # color by normalized anatomical (x, y) like the reference notebook
        colors = np.stack(
            [
                normalize(coords[:, 0]),
                normalize(coords[:, 1]),
                np.full(len(coords), 0.6),
            ],
            axis=1,
        )
        axis.scatter(mu[:, 0], mu[:, 1], s=2, c=colors, alpha=0.7, lw=0)
        axis.set_xlim(-1.05, 1.05)
        axis.set_ylim(1.05, -1.05)
        axis.set_title(f"mouse {mouse_id}", fontsize=TITLE_FONTSIZE)
        axis.set_xlabel("grid x", fontsize=LABEL_FONTSIZE)
        axis.set_ylabel("grid y", fontsize=LABEL_FONTSIZE)
    filename = os.path.join(args.output_dir, "plots", "readout_positions.png")
    save_figure(figure, filename)
    plt.close(figure)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, required=True)
    main(parser.parse_args())
