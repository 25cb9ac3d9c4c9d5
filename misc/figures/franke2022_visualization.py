"""Franke2022 dataset overview figures (port of reference
misc/franke2022_visualization.ipynb): per-mouse summary stats, example
color stimuli with their strongest responses, and behavior traces.

Usage: python misc/figures/franke2022_visualization.py --data_dir <dir>
"""

import argparse
import os

import numpy as np
import matplotlib.pyplot as plt

from _common import LABEL_FONTSIZE, TICK_FONTSIZE, TITLE_FONTSIZE, normalize, save_figure

from v1t_tpu.data.datasets import load_mice_data


def main(args):
    dataset, metadata = load_mice_data(
        ds_name="franke2022", mice_dir=args.data_dir,
        mouse_ids=args.mouse_ids,
    )
    for mouse_id in dataset:
        tiers = metadata[mouse_id]["tiers"]
        print(
            f"Mouse {mouse_id}  neurons: "
            f"{dataset[mouse_id]['response'].shape[1]}  trials: "
            f"{dataset[mouse_id]['image'].shape[0]}  test: "
            f"{int(np.count_nonzero(tiers == 'test'))}"
        )
        stats = metadata[mouse_id]["stats"]["behavior"]
        print(
            f"  pupil dilation min {stats['min'][0]:.2f} max "
            f"{stats['max'][0]:.2f} mean {stats['mean'][0]:.2f} std "
            f"{stats['std'][0]:.2f}"
        )

    mouse_id = next(iter(dataset))
    images = dataset[mouse_id]["image"]
    responses = dataset[mouse_id]["response"]
    behaviors = dataset[mouse_id]["behavior"]
    n_trials = min(args.num_trials, len(images))
    plot_dir = os.path.join(args.data_dir, "plots")

    # example stimuli (two projector channels as green/UV) + top responses
    figure, axes = plt.subplots(
        3, n_trials, figsize=(2.0 * n_trials, 4.2), dpi=240
    )
    order = np.argsort(-responses.std(axis=0))[:50]
    for i in range(n_trials):
        img = images[i]
        axes[0, i].imshow(normalize(img[0]), cmap="Greens_r")
        axes[1, i].imshow(normalize(img[-1]), cmap="Purples_r")
        axes[2, i].plot(responses[i][order], lw=0.6)
        axes[2, i].tick_params(labelsize=TICK_FONTSIZE)
        axes[0, i].axis("off")
        axes[1, i].axis("off")
    axes[0, 0].set_title("green channel", fontsize=TITLE_FONTSIZE, loc="left")
    axes[1, 0].set_title("UV channel", fontsize=TITLE_FONTSIZE, loc="left")
    axes[2, 0].set_ylabel("response", fontsize=LABEL_FONTSIZE)
    save_figure(figure, os.path.join(plot_dir, "franke2022_examples.png"))
    plt.close(figure)

    # behavior traces over trials
    figure, axes = plt.subplots(3, 1, figsize=(5, 3.4), dpi=240, sharex=True)
    names = ("pupil dilation", "dilation derivative", "speed")
    for axis, i, name in zip(axes, range(3), names):
        axis.plot(behaviors[:, i], lw=0.6)
        axis.set_ylabel(name, fontsize=LABEL_FONTSIZE)
        axis.tick_params(labelsize=TICK_FONTSIZE)
    axes[-1].set_xlabel("trial", fontsize=LABEL_FONTSIZE)
    save_figure(figure, os.path.join(plot_dir, "franke2022_behavior.png"))
    plt.close(figure)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--mouse_ids", type=str, nargs="+", default=None)
    parser.add_argument("--num_trials", type=int, default=5)
    main(parser.parse_args())
