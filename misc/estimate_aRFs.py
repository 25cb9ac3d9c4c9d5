"""Estimate artificial receptive fields (aRFs) of a trained model — TPU-native
rebuild of reference misc/estimate_aRFs.py:43-175.

Procedure: N white-noise stimuli (standardized) -> core + readout forward
(cropper skipped, zero behaviors) -> response-weighted average of the noise
per neuron -> 2D Gaussian curve_fit per neuron, dropping the worst 5% sigma
fits.
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

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize as opt

from v1t_tpu.configs import load_args
from v1t_tpu.data import get_training_ds
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model_variables
from v1t_tpu.ops.common import elu1
from v1t_tpu.utils.scheduler import Scheduler

IMAGE_SIZE = (1, 36, 64)


def generate_noise(num_samples: int, seed: int = 1234):
    rng = np.random.default_rng(seed)
    noise = rng.uniform(size=(num_samples, *IMAGE_SIZE)).astype(np.float32)
    images = (noise - noise.mean()) / noise.std()
    return images, noise


def white_noise_responses(
    model, params, model_state, images: np.ndarray, mouse_id: str,
    batch_size: int = 64,
) -> np.ndarray:
    """Core + readout forward on white noise, no cropper, zero behavior
    (reference estimate_aRFs.py:62-84)."""
    state = model_state or {}

    @jax.jit
    def step(params, x):
        b = x.shape[0]
        behaviors = jnp.zeros((b, 3), jnp.float32)
        pupil_centers = jnp.zeros((b, 2), jnp.float32)
        core_out = model.apply(
            {"params": params, **state},
            x, mouse_id=mouse_id, behaviors=behaviors,
            pupil_centers=pupil_centers, method="core_forward",
        )
        readout_out = model.apply(
            {"params": params, **state},
            core_out, mouse_id=mouse_id,
            method=lambda m, o, mouse_id: m.readouts(o, mouse_id=mouse_id),
        )
        return elu1(readout_out)

    outs = []
    for start in range(0, len(images), batch_size):
        x = jnp.asarray(images[start : start + batch_size])
        outs.append(np.asarray(step(params, x)))
    return np.concatenate(outs)


def estimate_RFs(activations: np.ndarray, noise: np.ndarray) -> np.ndarray:
    """Response-weighted noise average: (B,N),(B,C,H,W) -> (N,C,H,W)."""
    return np.einsum("bn,bchw->nchw", activations, noise)


def Gaussian2d(xy, amplitude, xo, yo, sigma_x, sigma_y, theta, offset):
    x, y = xy
    xo, yo = float(xo), float(yo)
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
        -(a * ((x - xo) ** 2) + 2 * b * (x - xo) * (y - yo) + c * ((y - yo) ** 2))
    )
    return g.ravel()


def fit_gaussian(aRFs: np.ndarray, seed: int = 0) -> np.ndarray:
    """Per-neuron 2D Gaussian fits; worst 5% sigma fits dropped
    (reference estimate_aRFs.py:127-175)."""
    num_units = aRFs.shape[0]
    mean = aRFs.mean(axis=(1, 2, 3), keepdims=True)
    std = aRFs.std(axis=(1, 2, 3), keepdims=True)
    aRFs = np.abs((aRFs - mean) / std)

    height, width = aRFs.shape[2:]
    x, y = np.meshgrid(np.arange(width, dtype=float), np.arange(height, dtype=float))
    rng = np.random.default_rng(seed)

    popts = np.full((num_units, 7), np.inf, np.float32)
    for unit in range(num_units):
        data = aRFs[unit][0].ravel()
        data_noisy = data + 0.2 * rng.normal(size=data.shape)
        try:
            popt, _ = opt.curve_fit(
                f=Gaussian2d,
                xdata=(x, y),
                ydata=data_noisy,
                p0=(3, width // 2, height // 2, 10, 10, 0, 10),
            )
            popts[unit] = popt
        except (RuntimeError, opt.OptimizeWarning):
            pass

    num_drops = int(0.05 * len(popts))
    if num_drops:
        large_sigma_x = np.argsort(popts[:, 3])[-num_drops:]
        large_sigma_y = np.argsort(popts[:, 4])[-num_drops:]
        drop_units = np.unique(np.concatenate((large_sigma_x, large_sigma_y)))
        popts[drop_units] = np.nan

    print(
        f"sigma X: {np.nanmean(popts[:, 3]):.03f} +- {np.nanstd(popts[:, 3]):.03f}\n"
        f"sigma Y: {np.nanmean(popts[:, 4]):.03f} +- {np.nanstd(popts[:, 4]):.03f}"
    )
    return popts


def main(args):
    config = load_args(args.output_dir)
    config.verbose = 0
    _, _, _, card = get_training_ds(
        config, data_dir=config.dataset, mouse_ids=config.mouse_ids,
        batch_size=args.batch_size,
    )
    model = build_model(config, card)
    params, model_state = init_model_variables(model, seed=config.seed)
    scheduler = Scheduler(config, save_optimizer=False)
    _, params, _, model_state = scheduler.restore(
        params, None, model_state, force=True
    )

    images, noise = generate_noise(args.num_samples)
    activations = white_noise_responses(
        model, params, model_state, images,
        mouse_id=args.mouse_id, batch_size=args.batch_size,
    )
    aRFs = estimate_RFs(activations, noise)
    popts = fit_gaussian(aRFs)

    filename = os.path.join(args.output_dir, "aRFs.pkl")
    with open(filename, "wb") as f:
        pickle.dump({"aRFs": aRFs, "popts": popts}, f)
    print(f"Saved aRFs to {filename}.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--mouse_id", type=str, default="A")
    parser.add_argument("--num_samples", type=int, default=100000)
    parser.add_argument("--batch_size", type=int, default=64)
    main(parser.parse_args())
