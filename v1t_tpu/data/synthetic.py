"""Synthetic mini-dataset generator in the exact on-disk layout of the
Sensorium/Franke2022 scans (reference data.py:122-231):

    <scan>/data/{images,responses,behavior,pupil_center}/<trial>.npy
    <scan>/meta/neurons/{unit_ids,cell_motor_coordinates,animal_ids}.npy
    <scan>/meta/trials/{tiers,trial_idx,frame_image_id|colorframeprojector_image_id}.npy
    <scan>/meta/statistics/<field>/all/{min,max,median,mean,std}.npy

Used as the integration-test fixture (SURVEY.md §4) and for dry-runs without
the real challenge data. The synthetic responses carry real structure
(Gaussian-receptive-field responses to the images, modulated by behavior) so
end-to-end training can demonstrably learn.
"""

from __future__ import annotations

import os
import typing as t
import zlib

import numpy as np

from v1t_tpu.data.datasets import get_mouse2path


def generate_mouse(
    data_dir: str,
    mouse_id: str,
    ds_name: str = "sensorium",
    num_neurons: int = 64,
    num_train: int = 60,
    num_validation: int = 20,
    num_test_images: int = 4,
    num_test_repeats: int = 5,
    num_final_test: int = 0,
    image_shape: t.Tuple[int, int, int] = (1, 36, 64),
    seed: int = 0,
) -> str:
    """Write one synthetic scan directory; returns its path."""
    # zlib.crc32, NOT hash(): str hash is salted per-process (PYTHONHASHSEED),
    # which would make fixture data differ between runs
    rng = np.random.default_rng(
        seed + zlib.crc32(mouse_id.encode("utf-8")) % 1000
    )
    mouse_dir = os.path.join(data_dir, get_mouse2path(ds_name)[mouse_id])
    c, h, w = image_shape

    num_test = num_test_images * num_test_repeats
    num_trials = num_train + num_validation + num_test + num_final_test

    # images: smooth random blobs in [0, 255]
    def make_images(n):
        base = rng.normal(size=(n, c, h // 4, w // 4))
        imgs = np.repeat(np.repeat(base, 4, axis=2), 4, axis=3)
        imgs = (imgs - imgs.min()) / (np.ptp(imgs) + 1e-6) * 255.0
        return imgs.astype(np.float32)

    unique_test = make_images(num_test_images)
    images = np.concatenate(
        [
            make_images(num_train + num_validation),
            np.repeat(unique_test, num_test_repeats, axis=0),
            make_images(num_final_test) if num_final_test else
            np.zeros((0, c, h, w), np.float32),
        ]
    )

    # image ids: unique for train/val; repeated for test
    image_ids = np.concatenate(
        [
            np.arange(num_train + num_validation),
            np.repeat(
                np.arange(10_000, 10_000 + num_test_images), num_test_repeats
            ),
            np.arange(20_000, 20_000 + num_final_test),
        ]
    ).astype(np.int64)

    behavior = np.abs(rng.normal(2.0, 1.0, size=(num_trials, 3))).astype(np.float32)
    pupil_center = rng.normal(0.0, 30.0, size=(num_trials, 2)).astype(np.float32)

    # neurons respond through Gaussian receptive fields over the image,
    # gain-modulated by behavior
    coords = rng.normal(size=(num_neurons, 3)).astype(np.float32) * 100
    rf_y = rng.integers(0, h, num_neurons)
    rf_x = rng.integers(0, w, num_neurons)
    weights = rng.gamma(2.0, 0.5, num_neurons).astype(np.float32)
    gain = 1.0 + 0.2 * (behavior @ rng.normal(size=(3, 1))).astype(np.float32)
    drive = images[:, 0, rf_y, rf_x] / 255.0  # (T, N)
    rates = weights * drive * np.abs(gain) + 0.05
    responses = rng.poisson(rates * 5.0).astype(np.float32)

    tiers = np.array(
        ["train"] * num_train
        + ["validation"] * num_validation
        + ["test"] * num_test
        + ["final_test"] * num_final_test
    )
    # shuffle trial order so tiers are interleaved like the real scans
    perm = rng.permutation(num_trials)
    images, responses = images[perm], responses[perm]
    behavior, pupil_center = behavior[perm], pupil_center[perm]
    image_ids, tiers = image_ids[perm], tiers[perm]
    trial_idx = rng.permutation(num_trials).astype(np.int64)

    # --- write the reference layout ------------------------------------------
    for field, arr in [
        ("images", images),
        ("responses", responses),
        ("behavior", behavior),
        ("pupil_center", pupil_center),
    ]:
        field_dir = os.path.join(mouse_dir, "data", field)
        os.makedirs(field_dir, exist_ok=True)
        for trial in range(num_trials):
            np.save(os.path.join(field_dir, f"{trial}.npy"), arr[trial])

    neuron_dir = os.path.join(mouse_dir, "meta", "neurons")
    os.makedirs(neuron_dir, exist_ok=True)
    np.save(
        os.path.join(neuron_dir, "unit_ids.npy"),
        rng.permutation(num_neurons).astype(np.int64) + 1,
    )
    np.save(os.path.join(neuron_dir, "cell_motor_coordinates.npy"), coords)
    np.save(
        os.path.join(neuron_dir, "animal_ids.npy"),
        np.full(num_neurons, 1000 + ord(mouse_id[-1]), np.int64),
    )

    trial_dir = os.path.join(mouse_dir, "meta", "trials")
    os.makedirs(trial_dir, exist_ok=True)
    np.save(os.path.join(trial_dir, "tiers.npy"), tiers)
    np.save(os.path.join(trial_dir, "trial_idx.npy"), trial_idx)
    id_file = (
        "frame_image_id.npy"
        if ds_name == "sensorium"
        else "colorframeprojector_image_id.npy"
    )
    np.save(os.path.join(trial_dir, id_file), image_ids)

    stats = {
        "images": images,
        "responses": responses,
        "behavior": behavior,
        "pupil_center": pupil_center,
    }
    for field, arr in stats.items():
        stat_dir = os.path.join(mouse_dir, "meta", "statistics", field, "all")
        os.makedirs(stat_dir, exist_ok=True)
        if field == "images":
            # scalar image statistics like the real scans
            reducers = {
                "min": np.array(arr.min()),
                "max": np.array(arr.max()),
                "median": np.array(np.median(arr)),
                "mean": np.array(arr.mean()),
                "std": np.array(arr.std()),
            }
        else:
            reducers = {
                "min": arr.min(0),
                "max": arr.max(0),
                "median": np.median(arr, 0),
                "mean": arr.mean(0),
                "std": arr.std(0) + 1e-4,
            }
        for k, v in reducers.items():
            np.save(os.path.join(stat_dir, f"{k}.npy"), v.astype(np.float32))
    return mouse_dir


def generate_dataset(
    data_dir: str,
    ds_name: str = "sensorium",
    mouse_ids: t.Sequence[str] = ("A", "B"),
    **kwargs,
) -> str:
    """Generate a multi-mouse synthetic dataset dir named like the real one
    (the loaders key off os.path.basename(dataset))."""
    root = os.path.join(data_dir, ds_name)
    os.makedirs(root, exist_ok=True)
    for i, mouse_id in enumerate(mouse_ids):
        generate_mouse(root, mouse_id=mouse_id, ds_name=ds_name, seed=i, **kwargs)
    return root
