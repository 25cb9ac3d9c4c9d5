"""Native batch-assembly kernels (v1t_tpu/data/_fastbatch.c) must be
BIT-EXACT with the numpy reference path for every mode — they silently
replace it inside MouseDataset.get_batch, so any drift would corrupt the
validated data pipeline."""

import numpy as np
import pytest

from v1t_tpu.data import fastbatch

pytestmark = pytest.mark.skipif(
    fastbatch.lib() is None, reason="no C toolchain for fastbatch"
)


def _numpy_image(src, idx, mean, std, reduce_gray, out_bf16):
    """The exact numpy chain from datasets.get_batch/transform_image."""
    x = np.asarray(src[idx], np.float32)
    x = (x - mean) / std
    if reduce_gray:
        x = np.mean(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    if out_bf16:
        import ml_dtypes

        x = x.astype(ml_dtypes.bfloat16)
    return x


@pytest.mark.parametrize("stats_dtype", [np.float64, np.float32])
@pytest.mark.parametrize("reduce_gray", [False, True])
@pytest.mark.parametrize("out_bf16", [False, True])
def test_gather_image_bit_exact(stats_dtype, reduce_gray, out_bf16):
    rng = np.random.default_rng(0)
    c = 3 if reduce_gray else 1
    src = rng.uniform(0, 255, size=(40, c, 18, 32)).astype(np.float32)
    idx = rng.integers(0, 40, size=13)
    mean = np.asarray(rng.uniform(100, 140), stats_dtype)
    std = np.asarray(rng.uniform(40, 70), stats_dtype)

    got = fastbatch.gather_image(
        src, idx, mean, std, reduce_gray=reduce_gray, out_bf16=out_bf16
    )
    assert got is not None
    want = _numpy_image(src, idx, mean, std, reduce_gray, out_bf16)
    assert got.dtype == want.dtype and got.shape == want.shape
    np.testing.assert_array_equal(
        got.view(np.uint16 if out_bf16 else np.uint32),
        want.view(np.uint16 if out_bf16 else np.uint32),
    )


def test_gather_image_per_channel_stats():
    """franke2022-style per-channel statistics broadcast over (C, H, W)."""
    rng = np.random.default_rng(1)
    src = rng.uniform(0, 255, size=(20, 3, 9, 16)).astype(np.float32)
    idx = rng.integers(0, 20, size=7)
    mean = rng.uniform(100, 140, size=(3, 1, 1))  # float64
    std = rng.uniform(40, 70, size=(3, 1, 1))
    got = fastbatch.gather_image(
        src, idx, mean, std, reduce_gray=True, out_bf16=False
    )
    want = _numpy_image(src, idx, mean, std, True, False)
    np.testing.assert_array_equal(got, want)


def test_gather_scale_and_rows():
    rng = np.random.default_rng(2)
    resp = rng.uniform(0, 9, size=(30, 101)).astype(np.float32)
    prec = rng.uniform(0.5, 3.0, size=101).astype(np.float32)
    idx = rng.integers(0, 30, size=11)
    got = fastbatch.gather_scale(resp, idx, prec)
    np.testing.assert_array_equal(got, resp[idx] * prec)

    beh = rng.normal(size=(30, 3)).astype(np.float32)
    np.testing.assert_array_equal(fastbatch.gather_rows(beh, idx), beh[idx])


def test_get_batch_native_vs_numpy(tmp_path, monkeypatch):
    """End-to-end: MouseDataset.get_batch with the native path enabled must
    equal the numpy path on the same synthetic scan, bf16 wire included."""
    import ml_dtypes

    from v1t_tpu.configs import Config
    from v1t_tpu.data.datasets import MouseDataset
    from v1t_tpu.data.synthetic import generate_mouse

    generate_mouse(str(tmp_path), "A", num_neurons=21, num_train=24,
                   num_validation=8, num_test_images=2,
                   image_shape=(1, 12, 20), seed=3)
    cfg = Config(dataset=str(tmp_path), behavior_mode=3, mouse_ids=["A"],
                 verbose=0)
    cfg.ds_name = "sensorium"
    ds = MouseDataset(cfg, tier="train", data_dir=str(tmp_path), mouse_id="A")
    pos = np.arange(10)[::-1].copy()  # unsorted on purpose

    for dtype in (None, ml_dtypes.bfloat16):
        native = ds.get_batch(pos, image_dtype=dtype)
        assert ds._get_batch_native(ds.indexes[pos], dtype) is not None
        monkeypatch.setenv("V1T_HOST_FASTPATH", "0")
        ref = ds.get_batch(pos, image_dtype=dtype)
        monkeypatch.delenv("V1T_HOST_FASTPATH")
        for key in ("image", "response", "behavior", "pupil_center"):
            assert native[key].dtype == ref[key].dtype, key
            np.testing.assert_array_equal(native[key], ref[key], err_msg=key)
        np.testing.assert_array_equal(native["image_id"], ref["image_id"])
        np.testing.assert_array_equal(native["trial_id"], ref["trial_id"])
