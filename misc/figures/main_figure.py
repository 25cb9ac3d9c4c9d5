"""Composite model-overview figure (port of reference misc/main_figure.ipynb):
one panel per analysis — example stimulus, target-vs-predicted responses,
an attention rollout overlay, an example aRF with its Gaussian fit, and the
readout's grid positions.

Usage: python misc/figures/main_figure.py --output_dir <run>
Pulls whatever artifacts exist in the run directory (evaluation data via a
fresh inference pass; attention_rollout_maps.pkl and aRFs.pkl if present)
and skips panels whose artifacts are missing.
"""

import argparse
import os
import pickle

import numpy as np
import matplotlib.cm as cm
import matplotlib.pyplot as plt

from _common import (
    LABEL_FONTSIZE, TICK_FONTSIZE, TITLE_FONTSIZE, gaussian2d, normalize,
    save_figure,
)

from v1t_tpu import training
from v1t_tpu.configs import load_args
from v1t_tpu.data import get_mouse_ids, get_training_ds
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model_variables
from v1t_tpu.utils.scheduler import Scheduler


def main(args):
    config = load_args(args.output_dir)
    config.verbose = 0
    get_mouse_ids(config)
    train_ds, val_ds, test_ds, card = get_training_ds(
        config, data_dir=config.dataset, mouse_ids=config.mouse_ids,
        batch_size=config.batch_size,
    )
    model = build_model(config, card)
    params, model_state = init_model_variables(model, seed=config.seed)
    scheduler = Scheduler(config, save_optimizer=False)
    _, params, _, model_state = scheduler.restore(
        params, None, model_state, force=True
    )
    trainer = training.Trainer(
        config, model, params, card, model_state=model_state
    )
    trainer.params = params

    mouse_id = args.mouse_id or card.mouse_ids[0]
    batch = next(iter(test_ds[mouse_id]))
    y_pred = trainer.predict(mouse_id, batch)
    y_true = batch["response"]

    figure, axes = plt.subplots(
        2, 3, figsize=(8.5, 4.6), dpi=240,
        gridspec_kw={"wspace": 0.3, "hspace": 0.4},
    )

    # (a) example stimulus
    axes[0, 0].imshow(batch["image"][0][0], cmap="gray")
    axes[0, 0].set_title("stimulus", fontsize=TITLE_FONTSIZE)
    axes[0, 0].axis("off")

    # (b) target vs prediction for the most active neurons
    order = np.argsort(-y_true[0])[:60]
    axes[0, 1].plot(y_true[0][order], lw=0.8, label="recorded")
    axes[0, 1].plot(y_pred[0][order], lw=0.8, label="predicted")
    axes[0, 1].legend(fontsize=TICK_FONTSIZE, frameon=False)
    axes[0, 1].set_title("responses (top units)", fontsize=TITLE_FONTSIZE)
    axes[0, 1].tick_params(labelsize=TICK_FONTSIZE)

    # (c) prediction scatter
    axes[0, 2].scatter(y_true.flatten(), y_pred.flatten(), s=1, alpha=0.25)
    axes[0, 2].set_xlabel("recorded", fontsize=LABEL_FONTSIZE)
    axes[0, 2].set_ylabel("predicted", fontsize=LABEL_FONTSIZE)
    axes[0, 2].set_title("batch scatter", fontsize=TITLE_FONTSIZE)
    axes[0, 2].tick_params(labelsize=TICK_FONTSIZE)

    # (d) attention rollout overlay (optional artifact)
    rollout_path = os.path.join(args.output_dir, "attention_rollout_maps.pkl")
    if not os.path.exists(rollout_path):
        rollout_path = os.path.join(args.output_dir, "attention_maps.pkl")
    axes[1, 0].set_title("attention rollout", fontsize=TITLE_FONTSIZE)
    axes[1, 0].axis("off")
    if os.path.exists(rollout_path):
        with open(rollout_path, "rb") as f:
            rollout = pickle.load(f)
        tier = next(iter(rollout))
        d = rollout[tier].get(mouse_id) or next(iter(rollout[tier].values()))
        axes[1, 0].imshow(np.asarray(d["images"])[0][0], cmap="gray")
        axes[1, 0].imshow(np.asarray(d["heatmaps"])[0], cmap=cm.turbo, alpha=0.5)
    else:
        axes[1, 0].text(0.5, 0.5, "no rollout artifact", ha="center")

    # (e) example aRF + Gaussian fit (optional artifact)
    arf_path = os.path.join(args.output_dir, "aRFs.pkl")
    axes[1, 1].set_title("example aRF", fontsize=TITLE_FONTSIZE)
    axes[1, 1].axis("off")
    if os.path.exists(arf_path):
        with open(arf_path, "rb") as f:
            arf = pickle.load(f)
        fitted = np.where(np.isfinite(arf["popts"][:, 1]))[0]
        unit = int(fitted[0]) if len(fitted) else 0
        a = arf["aRFs"][unit][0]
        axes[1, 1].imshow(normalize(a), cmap="gray")
        p = arf["popts"][unit]
        if np.all(np.isfinite(p)):
            h, w = a.shape
            x, y = np.meshgrid(np.arange(w), np.arange(h))
            g = gaussian2d((x, y), *p).reshape(h, w)
            axes[1, 1].contour(x, y, g, levels=2, colors="orangered",
                               linewidths=0.8)
    else:
        axes[1, 1].text(0.5, 0.5, "no aRF artifact", ha="center")

    # (f) readout grid positions
    import jax

    def mu_fn(p):
        def inner(mdl):
            return mdl.readouts.readouts[mouse_id].mu()

        return model.apply({"params": p}, method=inner)

    mu = np.asarray(jax.jit(mu_fn)(params)).reshape(-1, 2)
    axes[1, 2].scatter(mu[:, 0], mu[:, 1], s=2, alpha=0.5, lw=0)
    axes[1, 2].set_xlim(-1.05, 1.05)
    axes[1, 2].set_ylim(1.05, -1.05)
    axes[1, 2].set_title("readout positions", fontsize=TITLE_FONTSIZE)
    axes[1, 2].tick_params(labelsize=TICK_FONTSIZE)

    filename = os.path.join(args.output_dir, "plots", "main_figure.png")
    save_figure(figure, filename)
    plt.close(figure)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--mouse_id", type=str, default=None)
    main(parser.parse_args())
