"""ImageNet-style pretraining data pipeline (reference
src/v1t/pretrain/data.py:23-68): grayscale -> [0, 255] -> resize to the
Sensorium dimension (144, 256) (optionally (36, 64)) -> standardize with the
Sensorium train-set statistics; 70/15/15 split.

Works from an ImageFolder-style directory tree (class-per-subdir) via PIL,
or from in-memory arrays (tests / synthetic pretraining).
"""

from __future__ import annotations

import os
import typing as t
from glob import glob

import numpy as np

NUM_CLASSES = 1000  # ImageNet classes
# ImageNet standardized with the Sensorium train-set statistics
# (reference pretrain/data.py:12-14)
IMAGE_MEAN = 113.52469635009766
IMAGE_STD = 64.55815124511719
IMAGE_SIZE = (1, 144, 256)


def reverse(image: np.ndarray) -> np.ndarray:
    """Undo standardization."""
    return image * IMAGE_STD + IMAGE_MEAN


def _resize_nn_free(image: np.ndarray, height: int, width: int) -> np.ndarray:
    """Bilinear resize via jax.image (antialias=False, like torchvision)."""
    import jax.numpy as jnp
    from v1t_tpu.ops.grid_sample import resize_bilinear

    out = resize_bilinear(jnp.asarray(image, jnp.float32)[None], height, width)
    return np.asarray(out[0])


def transform_image(image: np.ndarray, resize_image: int = 1) -> np.ndarray:
    """(H, W[, C]) uint8/float image -> standardized (1, h, w) float32
    (reference pretrain/data.py:22-34)."""
    image = np.asarray(image, np.float32)
    if image.ndim == 3:
        image = image.mean(axis=-1)  # grayscale
    if image.max() <= 1.0:
        image = image * 255.0
    image = image[None]  # (1, H, W)
    image = _resize_nn_free(image, *IMAGE_SIZE[1:])
    if resize_image == 1:
        image = _resize_nn_free(image, 36, 64)
    return (image - IMAGE_MEAN) / IMAGE_STD


class ArrayImageDataset:
    """Batched dataset over (images, labels) arrays with 70/15/15 split."""

    def __init__(self, images: np.ndarray, labels: np.ndarray, seed: int = 1234):
        assert len(images) == len(labels)
        self.images = images
        self.labels = labels
        size = len(images)
        rng = np.random.default_rng(seed)
        order = rng.permutation(size)
        n_train, n_val = int(size * 0.7), int(size * 0.15)
        self.splits = {
            "train": order[:n_train],
            "validation": order[n_train : n_train + n_val],
            "test": order[n_train + n_val :],
        }

    def loader(self, split: str, batch_size: int, shuffle: bool = False,
               seed: int = 0):
        idx = self.splits[split]
        rng = np.random.default_rng(seed)

        def gen():
            order = rng.permutation(idx) if shuffle else idx
            for start in range(0, len(order), batch_size):
                sel = order[start : start + batch_size]
                yield self.images[sel], self.labels[sel]

        return gen


def load_image_folder(
    data_dir: str, resize_image: int = 1, limit: t.Optional[int] = None
) -> t.Tuple[np.ndarray, np.ndarray]:
    """Load an ImageFolder-style directory (class-per-subdir) into arrays."""
    from PIL import Image

    classes = sorted(
        d for d in os.listdir(data_dir)
        if os.path.isdir(os.path.join(data_dir, d))
    )
    images, labels = [], []
    for label, cls in enumerate(classes):
        for path in sorted(glob(os.path.join(data_dir, cls, "*"))):
            try:
                img = np.asarray(Image.open(path))
            except Exception:
                continue
            images.append(transform_image(img, resize_image=resize_image))
            labels.append(label)
            if limit and len(images) >= limit:
                break
        if limit and len(images) >= limit:
            break
    return np.stack(images), np.asarray(labels, np.int32)
