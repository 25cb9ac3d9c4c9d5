"""Artificial-receptive-field figures (port of reference
misc/plot_aRFs.ipynb): grids of example aRFs with their fitted Gaussian
contours, plus a KDE comparison of fitted RF centers between runs.

Usage:
  python misc/figures/plot_aRFs.py --output_dir <run>           # one model
  python misc/figures/plot_aRFs.py --output_dir <run> \
      --compare_dir <other_run> --labels ViT CNN                # center KDEs

Consumes <run>/aRFs.pkl written by misc/estimate_aRFs.py.
"""

import argparse
import os
import pickle

import numpy as np
import matplotlib.pyplot as plt

from _common import TITLE_FONTSIZE, gaussian2d, normalize, save_figure


def load(output_dir):
    with open(os.path.join(output_dir, "aRFs.pkl"), "rb") as f:
        return pickle.load(f)


def plot_grid(aRFs, popts, title, filename, num=6, seed=1234):
    rng = np.random.default_rng(seed)
    fitted = np.where(np.isfinite(popts[:, 1]))[0]
    units = rng.choice(
        fitted if len(fitted) >= num else np.arange(len(aRFs)),
        size=min(num, len(aRFs)), replace=False,
    )
    h, w = aRFs.shape[2], aRFs.shape[3]
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    figure, axes = plt.subplots(
        2, 3, gridspec_kw={"wspace": 0.02, "hspace": 0.2},
        figsize=(6, 2.6), dpi=240,
    )
    for axis, unit in zip(axes.flatten(), units):
        axis.imshow(normalize(aRFs[unit][0]), cmap="gray", vmin=0, vmax=1)
        p = popts[unit]
        if np.all(np.isfinite(p)):
            g = gaussian2d((x, y), *p).reshape(h, w)
            axis.contour(x, y, g, levels=2, colors="orangered", linewidths=0.8)
        axis.set_title(f"Unit #{unit}", fontsize=TITLE_FONTSIZE - 2)
        axis.axis("off")
    figure.suptitle(title, fontsize=TITLE_FONTSIZE)
    save_figure(figure, filename)
    plt.close(figure)


def load_centers(popts, image_size=(36, 64)):
    x, y = popts[:, 1], popts[:, 2]
    keep = np.isfinite(x) & np.isfinite(y)
    x, y = x[keep], y[keep]
    keep = (x >= 0) & (x < image_size[1]) & (y >= 0) & (y < image_size[0])
    return x[keep], y[keep]


def plot_center_kde(runs, labels, filename):
    import seaborn as sns

    thresh, levels = 0.01, 10
    figure, axes = plt.subplots(
        1, len(runs), figsize=(3.5 * len(runs), 2.5), dpi=120, squeeze=False
    )
    for axis, result, label in zip(axes[0], runs, labels):
        x, y = load_centers(result["popts"])
        if len(x) >= 3:
            sns.kdeplot(
                x=x, y=y, ax=axis, fill=True,
                levels=np.linspace(thresh, 1.0, levels), thresh=thresh,
                cmap="inferno",
            )
        else:
            axis.scatter(x, y, s=4)
        axis.set_xlim(0, 64)
        axis.set_ylim(36, 0)
        axis.set_title(label, fontsize=TITLE_FONTSIZE)
    save_figure(figure, filename)
    plt.close(figure)


def main(args):
    result = load(args.output_dir)
    plot_dir = os.path.join(args.output_dir, "plots")
    plot_grid(
        result["aRFs"], result["popts"], title=args.labels[0],
        filename=os.path.join(plot_dir, "aRFs.png"),
    )
    runs, labels = [result], [args.labels[0]]
    if args.compare_dir:
        runs.append(load(args.compare_dir))
        labels.append(args.labels[1] if len(args.labels) > 1 else "other")
    plot_center_kde(
        runs, labels, os.path.join(plot_dir, "aRF_centers.png")
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--compare_dir", type=str, default=None)
    parser.add_argument("--labels", type=str, nargs="+", default=["V1T"])
    main(parser.parse_args())
