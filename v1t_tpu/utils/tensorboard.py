"""TensorBoard summary: three writers (train/validation/test), scalar +
figure + image APIs (reference src/v1t/utils/tensorboard.py:127-209).

Uses torch.utils.tensorboard's pure-python writer (no torch tensors
involved); degrades to a no-op if tensorboard is unavailable.
"""

from __future__ import annotations

import io
import os
import typing as t

import numpy as np

try:
    from torch.utils.tensorboard import SummaryWriter

    _HAS_TB = True
except Exception:  # pragma: no cover
    _HAS_TB = False


class Summary:
    """mode 0: train, 1: validation, 2: test."""

    def __init__(self, config):
        self.dpi = getattr(config, "dpi", 120)
        self.save_plots = getattr(config, "save_plots", False)
        self.format = getattr(config, "format", "svg")
        self.plots_dir = os.path.join(config.output_dir, "plots")
        self.writers: t.List[t.Optional[object]] = [None, None, None]
        if _HAS_TB and config.output_dir:
            log_dir = config.output_dir
            self.writers = [
                SummaryWriter(log_dir=log_dir),
                SummaryWriter(log_dir=os.path.join(log_dir, "val")),
                SummaryWriter(log_dir=os.path.join(log_dir, "test")),
            ]

    def get_writer(self, mode: int = 0):
        return self.writers[mode]

    def scalar(self, tag: str, value, step: int = 0, mode: int = 0):
        writer = self.get_writer(mode)
        if writer is not None:
            writer.add_scalar(tag, float(value), global_step=step)

    def histogram(self, tag: str, values, step: int = 0, mode: int = 0):
        writer = self.get_writer(mode)
        if writer is not None:
            writer.add_histogram(tag, np.asarray(values), global_step=step)

    def image(self, tag: str, values, step: int = 0, mode: int = 0):
        writer = self.get_writer(mode)
        if writer is not None:
            writer.add_image(tag, np.asarray(values), global_step=step,
                             dataformats="CHW")

    def figure(self, tag: str, figure, step: int = 0, close: bool = True,
               mode: int = 0):
        """Render a matplotlib figure to the writer (and optionally disk)."""
        writer = self.get_writer(mode)
        if self.save_plots:
            os.makedirs(self.plots_dir, exist_ok=True)
            fname = os.path.join(
                self.plots_dir, f"{tag.replace('/', '_')}_{step}.{self.format}"
            )
            figure.savefig(fname, dpi=self.dpi, bbox_inches="tight")
        if writer is not None:
            buf = io.BytesIO()
            figure.savefig(buf, format="png", dpi=self.dpi, bbox_inches="tight")
            buf.seek(0)
            import PIL.Image

            img = np.asarray(PIL.Image.open(buf).convert("RGB"))
            writer.add_image(tag, img, global_step=step, dataformats="HWC")
        if close:
            import matplotlib.pyplot as plt

            plt.close(figure)

    def hparams(self, hparams: dict, metrics: dict, mode: int = 0):
        """TensorBoard HParams plugin entry: one row per run relating the
        swept hyperparameters to the final metrics (the TB counterpart of
        the wandb sweep table)."""
        writer = self.get_writer(mode)
        if writer is None:
            return
        clean = {
            k: (v if isinstance(v, (int, float, bool, str)) else str(v))
            for k, v in hparams.items()
            if v is not None
        }
        writer.add_hparams(
            clean,
            {f"hparam/{k}": float(v) for k, v in metrics.items()},
            run_name=".",
        )

    def close(self):
        for writer in self.writers:
            if writer is not None:
                writer.close()
