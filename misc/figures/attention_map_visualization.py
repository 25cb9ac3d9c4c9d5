"""Attention-rollout analysis figures (port of reference
misc/attention_map_visualization.ipynb): correlate the attention maps'
centers of mass with pupil center position and pupil dilation, and render
example stimulus/heatmap overlays.

Usage: python misc/figures/attention_map_visualization.py --output_dir <run>
Consumes <run>/attention_rollout_maps.pkl (misc/extract_attention_maps.py).
"""

import argparse
import os
import pickle

import numpy as np
import matplotlib.cm as cm
import matplotlib.pyplot as plt
from scipy.ndimage import center_of_mass
from scipy.stats import pearsonr

from _common import LABEL_FONTSIZE, TITLE_FONTSIZE, p_value_to_asterisks, save_figure


def compute_centers(heatmaps: np.ndarray) -> np.ndarray:
    """Center of mass per heatmap, relative to the image midpoint
    (reference attention_map_visualization.ipynb)."""
    centers = np.zeros((len(heatmaps), 2), np.float32)
    for i, heatmap in enumerate(heatmaps):
        y, x = center_of_mass(heatmap)
        centers[i] = (x, y)
    h, w = heatmaps.shape[1], heatmaps.shape[2]
    return centers - np.array([w / 2, h / 2])


def abs_correlation(x, y):
    corr, p_value = pearsonr(x, y)
    return float(np.abs(corr)), p_value_to_asterisks(p_value)


def plot_examples(images, heatmaps, filename, num=4):
    figure, axes = plt.subplots(2, num, figsize=(2 * num, 2.6), dpi=240)
    for i in range(min(num, len(images))):
        axes[0, i].imshow(images[i][0], cmap="gray")
        axes[1, i].imshow(images[i][0], cmap="gray")
        axes[1, i].imshow(heatmaps[i], cmap=cm.turbo, alpha=0.55)
        for ax in (axes[0, i], axes[1, i]):
            ax.axis("off")
    axes[0, 0].set_title("stimulus", fontsize=TITLE_FONTSIZE, loc="left")
    axes[1, 0].set_title("attention rollout", fontsize=TITLE_FONTSIZE, loc="left")
    save_figure(figure, filename)
    plt.close(figure)


def main(args):
    path = os.path.join(args.output_dir, "attention_rollout_maps.pkl")
    if not os.path.exists(path):  # extract_attention_maps.py default name
        path = os.path.join(args.output_dir, "attention_maps.pkl")
    with open(path, "rb") as f:
        results = pickle.load(f)
    plot_dir = os.path.join(args.output_dir, "plots")

    tier = args.tier if args.tier in results else next(iter(results))
    rows = []
    for mouse_id, d in results[tier].items():
        heatmaps = np.asarray(d["heatmaps"])
        centers = compute_centers(heatmaps)
        pupil_centers = np.asarray(d["pupil_centers"])
        dilation = np.asarray(d["behaviors"])[:, 0]
        cx, ax_ = abs_correlation(centers[:, 0], pupil_centers[:, 0])
        cy, ay_ = abs_correlation(centers[:, 1], pupil_centers[:, 1])
        dx, axd = abs_correlation(centers[:, 0], dilation)
        dy, ayd = abs_correlation(centers[:, 1], dilation)
        rows.append((mouse_id, cx, ax_, cy, ay_, dx, axd, dy, ayd))
        print(
            f"mouse {mouse_id}: |corr(center, pupil)| x={cx:.3f}{ax_} "
            f"y={cy:.3f}{ay_}; |corr(center, dilation)| x={dx:.3f}{axd} "
            f"y={dy:.3f}{ayd}"
        )
        plot_examples(
            np.asarray(d["images"]), heatmaps,
            os.path.join(plot_dir, f"attention_maps_{mouse_id}.png"),
        )

    # summary bar chart over mice
    figure, axis = plt.subplots(figsize=(4.2, 2.4), dpi=240)
    width = 0.2
    idx = np.arange(len(rows))
    for off, col, label in (
        (-1.5, 1, "center x ~ pupil x"), (-0.5, 3, "center y ~ pupil y"),
        (0.5, 5, "center x ~ dilation"), (1.5, 7, "center y ~ dilation"),
    ):
        axis.bar(
            idx + off * width, [r[col] for r in rows], width=width, label=label
        )
    axis.set_xticks(idx, [r[0] for r in rows], fontsize=LABEL_FONTSIZE)
    axis.set_ylabel("|Pearson r|", fontsize=LABEL_FONTSIZE)
    axis.legend(fontsize=5, frameon=False, ncol=2)
    save_figure(figure, os.path.join(plot_dir, "attention_center_correlations.png"))
    plt.close(figure)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--tier", type=str, default="test")
    main(parser.parse_args())
