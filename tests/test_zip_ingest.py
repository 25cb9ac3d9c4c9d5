"""Zip ingest path: a scan shipped as <basename>.zip must lazily extract on
first touch (reference data.py:113-119, 180-184)."""

import os
import shutil
import zipfile

import numpy as np

from v1t_tpu.configs import Config
from v1t_tpu.data import MouseDataset, get_mouse_ids, get_mouse2path
from v1t_tpu.data.synthetic import generate_mouse


def test_unzip_on_first_touch(tmp_path):
    data_dir = str(tmp_path / "sensorium")
    os.makedirs(data_dir)
    mouse_dir = generate_mouse(data_dir, mouse_id="A", num_neurons=16,
                               num_train=8, num_validation=4,
                               num_test_images=2, num_test_repeats=2)
    basename = get_mouse2path("sensorium")["A"]

    # zip the extracted scan, then remove the directory
    zip_path = os.path.join(data_dir, f"{basename}.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _, files in os.walk(mouse_dir):
            for f in files:
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, data_dir))
    shutil.rmtree(mouse_dir)
    assert not os.path.isdir(mouse_dir)

    cfg = Config(dataset=data_dir, behavior_mode=0, mouse_ids=["A"], verbose=0)
    get_mouse_ids(cfg)
    ds = MouseDataset(cfg, tier="train", data_dir=data_dir, mouse_id="A")
    assert os.path.isdir(mouse_dir)  # extracted lazily
    assert len(ds) == 8
    batch = ds.get_batch(np.arange(2))
    assert batch["image"].shape == (2, 1, 36, 64)
