"""Limited-training-data comparison figure (port of reference
misc/limit_data.ipynb): mean single-trial correlation vs training-set size
for several models, with Welch t-test significance markers between the two
best models per size.

Usage:
  python misc/figures/limit_data.py --runs_dir <dir> \
      [--train_sizes 500 1500 2500 3500 4500] [--models stacked2d vit v1t]

Expects <runs_dir>/<train_size>/<model>/<run>/evaluation.yaml (several seeds
per cell, exactly the reference's sweep layout).
"""

import argparse
import os
from glob import glob

import numpy as np
import matplotlib.pyplot as plt
import yaml
from scipy.stats import ttest_ind

from _common import LABEL_FONTSIZE, TICK_FONTSIZE, p_value_to_asterisks, save_figure


def get_results(runs_dir, train_sizes, models):
    results = {}
    for train_size in train_sizes:
        results[train_size] = {m: [] for m in models}
        for model in models:
            for run in glob(os.path.join(runs_dir, str(train_size), model, "*")):
                filename = os.path.join(run, "evaluation.yaml")
                if os.path.exists(filename):
                    with open(filename) as f:
                        result = yaml.safe_load(f)
                    results[train_size][model].append(
                        result["single_trial_correlation"]["average"]
                    )
    return results


def main(args):
    results = get_results(args.runs_dir, args.train_sizes, args.models)
    figure, axis = plt.subplots(figsize=(4.2, 2.8), dpi=240)
    for model in args.models:
        means = [np.mean(results[s][model] or [np.nan]) for s in args.train_sizes]
        stds = [np.std(results[s][model] or [np.nan]) for s in args.train_sizes]
        axis.errorbar(
            args.train_sizes, means, yerr=stds, marker="o", markersize=3,
            capsize=2, label=model, lw=1,
        )
    # significance between the two last-listed models per size
    if len(args.models) >= 2:
        a_name, b_name = args.models[-2], args.models[-1]
        for size in args.train_sizes:
            a, b = results[size][a_name], results[size][b_name]
            if len(a) >= 2 and len(b) >= 2:
                _, p = ttest_ind(a, b, equal_var=False)
                y = max(np.mean(a), np.mean(b))
                axis.text(
                    size, y * 1.02, p_value_to_asterisks(p),
                    ha="center", fontsize=TICK_FONTSIZE,
                )
    axis.set_xlabel("training trials", fontsize=LABEL_FONTSIZE)
    axis.set_ylabel("single-trial correlation", fontsize=LABEL_FONTSIZE)
    axis.legend(fontsize=LABEL_FONTSIZE - 1, frameon=False)
    axis.tick_params(labelsize=TICK_FONTSIZE)
    save_figure(figure, os.path.join(args.runs_dir, "plots", "limit_data.png"))
    plt.close(figure)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--runs_dir", type=str, required=True)
    parser.add_argument(
        "--train_sizes", type=int, nargs="+",
        default=[500, 1500, 2500, 3500, 4500],
    )
    parser.add_argument(
        "--models", type=str, nargs="+", default=["stacked2d", "vit", "v1t"]
    )
    main(parser.parse_args())
