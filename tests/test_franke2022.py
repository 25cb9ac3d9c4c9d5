"""Franke2022 path: color stimuli, gray_scale collapse, no-resize cropper
(BASELINE.json config #3)."""

import numpy as np
import pytest

import train as train_cli
from v1t_tpu.configs import Config
from v1t_tpu.data import get_mouse_ids, get_training_ds
from v1t_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def franke_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("franke")
    return generate_dataset(
        str(root), ds_name="franke2022", mouse_ids=("F", "G"),
        image_shape=(2, 36, 64),
    )


@pytest.mark.slow
def test_color_channels_flow_through_model(franke_dir, tmp_path):
    """2-channel color stimuli without gray_scale: the cropper must skip the
    resize (reference image_cropper.py:97) and the core must see 2 channels."""
    cfg = Config(
        dataset=franke_dir,
        output_dir=str(tmp_path / "franke"),
        behavior_mode=3,
        shift_mode=2,
        core="vit",
        readout="gaussian2d",
        batch_size=8,
        epochs=1,
        num_blocks=2,
        emb_dim=16,
        num_heads=2,
        mlp_dim=32,
        patch_size=8,
        patch_stride=4,
        precision="fp32",
        resize_image=1,  # must be ignored for franke2022
        verbose=0,
        mouse_ids=["F", "G"],
        data_parallel=1,
    )
    result = train_cli.main(cfg)
    assert "single_trial_correlation" in result
    assert cfg.input_shape == (2, 36, 64)


def test_gray_scale_collapses_channels(franke_dir):
    cfg = Config(
        dataset=franke_dir, behavior_mode=0, gray_scale=True,
        mouse_ids=["F"],
    )
    get_mouse_ids(cfg)
    train_ds, _, _, card = get_training_ds(
        cfg, data_dir=franke_dir, mouse_ids=["F"], batch_size=4
    )
    assert card.input_shape == (1, 36, 64)
    batch = next(iter(train_ds["F"]))
    assert batch["image"].shape == (4, 1, 36, 64)
    # gray = mean over the color channels of the standardized image
    ds = train_ds["F"].dataset
    raw = np.asarray(ds._packed["images"][ds.indexes[:1]], np.float32)
    std = (raw - ds.image_stats["mean"]) / ds.image_stats["std"]
    np.testing.assert_allclose(
        ds.transform_image(raw), std.mean(axis=1, keepdims=True), rtol=1e-5
    )
