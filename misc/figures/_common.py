"""Shared helpers for the paper-figure scripts (ports of the reference's
misc/*.ipynb notebooks to runnable scripts; reference misc/ contains
attention_map_visualization, franke2022_visualization, limit_data,
main_figure, plot_aRFs and readout_visualization notebooks)."""

from __future__ import annotations

import os
import sys

import matplotlib
import numpy as np

matplotlib.use("Agg")

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

LABEL_FONTSIZE, TICK_FONTSIZE, TITLE_FONTSIZE = 8, 6, 9


def p_value_to_asterisks(p_value: float) -> str:
    """Significance markers (reference limit_data.ipynb /
    attention_map_visualization.ipynb)."""
    if p_value <= 0.0001:
        return "****"
    if p_value <= 0.001:
        return "***"
    if p_value <= 0.01:
        return "**"
    if p_value <= 0.05:
        return "*"
    return "n.s."


def normalize(a: np.ndarray) -> np.ndarray:
    return (a - np.min(a)) / (np.max(a) - np.min(a) + 1e-6)


def gaussian2d(xy, amplitude, xo, yo, sigma_x, sigma_y, theta, offset):
    """2D rotated Gaussian (reference main_figure.ipynb / estimate_aRFs)."""
    x, y = xy
    a = (np.cos(theta) ** 2) / (2 * sigma_x**2) + (np.sin(theta) ** 2) / (
        2 * sigma_y**2
    )
    b = -(np.sin(2 * theta)) / (4 * sigma_x**2) + (np.sin(2 * theta)) / (
        4 * sigma_y**2
    )
    c = (np.sin(theta) ** 2) / (2 * sigma_x**2) + (np.cos(theta) ** 2) / (
        2 * sigma_y**2
    )
    g = offset + amplitude * np.exp(
        -(a * (x - xo) ** 2 + 2 * b * (x - xo) * (y - yo) + c * (y - yo) ** 2)
    )
    return g.ravel()


def save_figure(figure, filename: str, dpi: int = 240):
    os.makedirs(os.path.dirname(filename), exist_ok=True)
    figure.savefig(filename, dpi=dpi, bbox_inches="tight")
    print(f"saved {filename}")
