"""Sample visualization panels: raw image + crop box + target/prediction
scatter per mouse (reference utils/utils.py:202-261 plot_samples +
tensorboard.py:227-364 plot_image_response), logged to TensorBoard every 10
epochs and optionally to disk."""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _plot_image_response(results: dict, dpi: int = 120):
    """One figure per sample: [raw image with crop box | cropped image |
    target vs prediction scatter]."""
    figures = []
    num_plots = len(results["images"])
    for i in range(num_plots):
        figure, axes = plt.subplots(
            nrows=1, ncols=3, figsize=(12, 3), dpi=dpi,
            gridspec_kw={"wspace": 0.3},
        )
        image = results["images"][i][0]
        crop = results["crop_images"][i][0]
        grid = results["image_grids"][i]  # (h, w, 2) in [-1, 1]
        axes[0].imshow(image, cmap="gray", aspect="auto")
        # crop box from the sampling-grid extremes
        h, w = image.shape
        x0 = (grid[..., 0].min() + 1) / 2 * (w - 1)
        x1 = (grid[..., 0].max() + 1) / 2 * (w - 1)
        y0 = (grid[..., 1].min() + 1) / 2 * (h - 1)
        y1 = (grid[..., 1].max() + 1) / 2 * (h - 1)
        axes[0].plot(
            [x0, x1, x1, x0, x0], [y0, y0, y1, y1, y0], "r-", linewidth=1
        )
        axes[0].set_title("stimulus + crop")
        axes[1].imshow(crop, cmap="gray", aspect="auto")
        axes[1].set_title("model input")
        axes[2].scatter(
            results["targets"][i], results["predictions"][i], s=2, alpha=0.4
        )
        axes[2].set_xlabel("target")
        axes[2].set_ylabel("prediction")
        axes[2].set_title(f"image {results['image_ids'][i]}")
        for ax in axes[:2]:
            ax.set_xticks([])
            ax.set_yticks([])
        figures.append(figure)
    return figures


def plot_samples(
    config,
    trainer,
    ds: dict,
    summary,
    epoch: int,
    mode: int = 1,
    num_plots: int = 5,
):
    """Forward a few samples per mouse and log image/response panels."""
    for mouse_id, loader in ds.items():
        batch = next(iter(loader))
        n = min(num_plots, len(batch["image"]))
        batch = {
            k: (v[:n] if isinstance(v, np.ndarray) else v)
            for k, v in batch.items()
        }
        state = trainer.model_state or {}
        predictions, crop_images, image_grids = trainer.model.apply(
            {"params": trainer.params, **state},
            jnp.asarray(batch["image"]),
            mouse_id=mouse_id,
            behaviors=jnp.asarray(batch["behavior"]),
            pupil_centers=jnp.asarray(batch["pupil_center"]),
            train=False,
        )
        i_transform = loader.dataset.i_transform_image
        results = {
            "images": i_transform(np.asarray(batch["image"])),
            "crop_images": i_transform(np.asarray(crop_images, np.float32)),
            "image_grids": np.asarray(image_grids, np.float32),
            "targets": np.asarray(batch["response"]),
            "predictions": np.asarray(predictions, np.float32),
            "image_ids": np.asarray(batch["image_id"]).ravel(),
        }
        figures = _plot_image_response(results, dpi=getattr(config, "dpi", 120))
        for i, figure in enumerate(figures):
            summary.figure(
                f"image_response/mouse{mouse_id}/{i:02d}",
                figure=figure,
                step=epoch,
                mode=mode,
            )
