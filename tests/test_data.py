"""Data-layer tests over the synthetic fixture (reference on-disk layout,
SURVEY.md §4 integration oracle)."""

import numpy as np
import pytest

from v1t_tpu.configs import Config
from v1t_tpu.data import (
    CycleLoaders,
    MouseDataset,
    get_mouse_ids,
    get_training_ds,
    micro_batching,
)
from v1t_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def sensorium_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return generate_dataset(str(root), ds_name="sensorium", mouse_ids=("A", "B"))


@pytest.fixture(scope="module")
def franke_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data_franke")
    return generate_dataset(
        str(root),
        ds_name="franke2022",
        mouse_ids=("F",),
        image_shape=(2, 36, 64),
    )


def _config(dataset, **kw):
    cfg = Config(dataset=dataset, behavior_mode=0, **kw)
    get_mouse_ids(cfg)
    return cfg


def test_mouse_ids_resolution(sensorium_dir):
    cfg = Config(dataset=sensorium_dir, behavior_mode=3)
    get_mouse_ids(cfg)
    assert cfg.ds_name == "sensorium"
    assert "S0" not in cfg.mouse_ids  # S0 has no behavior data

    cfg0 = Config(dataset=sensorium_dir, behavior_mode=0)
    get_mouse_ids(cfg0)
    assert "S0" in cfg0.mouse_ids


def test_dataset_tiers_and_shapes(sensorium_dir):
    cfg = _config(sensorium_dir, mouse_ids=["A"])
    ds = MouseDataset(cfg, tier="train", data_dir=sensorium_dir, mouse_id="A")
    assert len(ds) == 60
    assert ds.image_shape == (1, 36, 64)
    assert ds.num_neurons == 64
    val = MouseDataset(cfg, tier="validation", data_dir=sensorium_dir, mouse_id="A")
    test = MouseDataset(cfg, tier="test", data_dir=sensorium_dir, mouse_id="A")
    assert len(val) == 20 and len(test) == 20


def test_response_precision_rule(sensorium_dir):
    """std <= 1% of mean std is clipped to 1/threshold (reference
    data.py:394-404)."""
    cfg = _config(sensorium_dir, mouse_ids=["A"])
    ds = MouseDataset(cfg, tier="train", data_dir=sensorium_dir, mouse_id="A")
    std = ds.response_stats["std"]
    threshold = 0.01 * np.mean(std)
    precision = ds._response_precision
    expected = np.where(std > threshold, 1 / std, 1 / threshold)
    np.testing.assert_allclose(precision, expected, rtol=1e-6)
    # transform/inverse roundtrip
    r = np.abs(np.random.default_rng(0).normal(size=(5, ds.num_neurons))).astype(
        np.float32
    )
    np.testing.assert_allclose(
        ds.i_transform_response(ds.transform_response(r)), r, rtol=1e-5
    )


def test_batch_matches_per_trial_loading(sensorium_dir):
    """The packed-array batch path must equal per-trial .npy loading +
    per-sample transforms (the reference __getitem__ semantics)."""
    from v1t_tpu.data.datasets import load_trial_data

    cfg = _config(sensorium_dir, mouse_ids=["A"])
    ds = MouseDataset(cfg, tier="train", data_dir=sensorium_dir, mouse_id="A")
    positions = np.array([0, 3, 7])
    batch = ds.get_batch(positions)
    for j, pos in enumerate(positions):
        trial = ds.indexes[pos]
        raw = load_trial_data(ds.mouse_dir, trial=trial)
        np.testing.assert_allclose(
            batch["image"][j], ds.transform_image(raw["image"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            batch["response"][j], ds.transform_response(raw["response"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            batch["behavior"][j], ds.transform_behavior(raw["behavior"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            batch["pupil_center"][j],
            ds.transform_pupil_center(raw["pupil_center"]),
            rtol=1e-5,
        )


def test_image_standardization_roundtrip(sensorium_dir):
    cfg = _config(sensorium_dir, mouse_ids=["A"])
    ds = MouseDataset(cfg, tier="train", data_dir=sensorium_dir, mouse_id="A")
    batch = ds.get_batch(np.arange(4))
    raw = ds.i_transform_image(batch["image"])
    assert raw.min() >= -1.0 and raw.max() <= 256.0  # back to pixel scale


def test_gray_scale_franke(franke_dir):
    cfg = Config(dataset=franke_dir, behavior_mode=0, gray_scale=True, mouse_ids=["F"])
    get_mouse_ids(cfg)
    ds = MouseDataset(cfg, tier="train", data_dir=franke_dir, mouse_id="F")
    assert ds.image_shape == (1, 36, 64)
    batch = ds.get_batch(np.arange(2))
    assert batch["image"].shape == (2, 1, 36, 64)


def test_training_ds_and_data_card(sensorium_dir):
    cfg = _config(sensorium_dir, mouse_ids=["A", "B"])
    train, val, test, card = get_training_ds(
        cfg, data_dir=sensorium_dir, mouse_ids=["A", "B"], batch_size=8
    )
    assert set(train) == {"A", "B"}
    assert card.input_shape == (1, 36, 64)
    assert card.output_shapes == {"A": (64,), "B": (64,)}
    assert cfg.output_shapes == {"A": (64,), "B": (64,)}
    assert card.ds_sizes == {"A": 60, "B": 60}
    batch = next(iter(train["A"]))
    assert batch["image"].shape == (8, 1, 36, 64)
    assert batch["response"].shape == (8, 64)
    assert batch["behavior"].shape == (8, 3)
    assert batch["pupil_center"].shape == (8, 2)
    assert batch["mouse_id"] == "A"


def test_cycle_loaders_schedule(sensorium_dir):
    """Round-robin mouse order; len = num_mice * max_iterations (reference
    data.py:71-103)."""
    cfg = _config(sensorium_dir, mouse_ids=["A", "B"])
    train, _, _, _ = get_training_ds(
        cfg, data_dir=sensorium_dir, mouse_ids=["A", "B"], batch_size=16
    )
    cyc = CycleLoaders(train)
    seq = [mouse_id for mouse_id, _ in cyc]
    assert len(seq) == len(cyc) == 2 * len(train["A"])
    assert seq[::2] == ["A"] * len(train["A"])
    assert seq[1::2] == ["B"] * len(train["B"])


def test_micro_batching(sensorium_dir):
    cfg = _config(sensorium_dir, mouse_ids=["A"])
    train, _, _, _ = get_training_ds(
        cfg, data_dir=sensorium_dir, mouse_ids=["A"], batch_size=16
    )
    batch = next(iter(train["A"]))
    micros = list(micro_batching(batch, 5))
    assert [len(m["image"]) for m in micros] == [5, 5, 5, 1]
    np.testing.assert_array_equal(
        np.concatenate([m["image"] for m in micros]), batch["image"]
    )


def test_shuffle_differs_across_epochs(sensorium_dir):
    cfg = _config(sensorium_dir, mouse_ids=["A"])
    train, _, _, _ = get_training_ds(
        cfg, data_dir=sensorium_dir, mouse_ids=["A"], batch_size=60
    )
    ids1 = next(iter(train["A"]))["trial_id"]
    ids2 = next(iter(train["A"]))["trial_id"]
    assert sorted(ids1) == sorted(ids2)
    assert not np.array_equal(ids1, ids2)


def test_cycle_loaders_unequal_lengths(sensorium_dir):
    """Shorter loaders cycle until the longest is exhausted; len is
    num_mice * max_iterations (reference data.py:71-103)."""
    cfg_a = _config(sensorium_dir, mouse_ids=["A"])
    cfg_b = _config(sensorium_dir, mouse_ids=["B"], limit_data=20, seed=1)
    from v1t_tpu.data.datasets import MouseDataset
    from v1t_tpu.data.loaders import BatchLoader

    loader_a = BatchLoader(
        MouseDataset(cfg_a, tier="train", data_dir=sensorium_dir, mouse_id="A"),
        batch_size=10,
    )  # 60 trials -> 6 batches
    loader_b = BatchLoader(
        MouseDataset(cfg_b, tier="train", data_dir=sensorium_dir, mouse_id="B"),
        batch_size=10,
    )  # 20 trials -> 2 batches
    cyc = CycleLoaders({"A": loader_a, "B": loader_b})
    assert len(cyc) == 2 * 6
    seq = list(cyc)
    assert len(seq) == 12
    # A appears 6 times with its 6 distinct batches; B cycles its 2 batches 3x
    a_batches = [b for m, b in seq if m == "A"]
    b_batches = [b for m, b in seq if m == "B"]
    assert len(a_batches) == 6 and len(b_batches) == 6
    b_ids = [tuple(b["trial_id"]) for b in b_batches]
    assert len(set(b_ids)) == 2  # two distinct batches, repeated
