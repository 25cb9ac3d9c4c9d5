"""Attention rollout: probs export path + rollout math."""

import numpy as np
import pytest

from v1t_tpu.configs import Config
from v1t_tpu.data import get_mouse_ids, get_training_ds
from v1t_tpu.data.synthetic import generate_dataset
from v1t_tpu.analysis import attention_rollout, extract_attention_maps
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    data_dir = generate_dataset(str(root), ds_name="sensorium", mouse_ids=("A",))
    cfg = Config(
        dataset=data_dir, behavior_mode=3, shift_mode=2, core="vit",
        readout="gaussian2d", batch_size=8, num_blocks=2, emb_dim=16,
        num_heads=2, mlp_dim=32, patch_size=8, patch_stride=4,
        precision="fp32", attention_impl="xla", verbose=0, mouse_ids=["A"],
    )
    get_mouse_ids(cfg)
    train_ds, val_ds, _, card = get_training_ds(
        cfg, data_dir=data_dir, mouse_ids=["A"], batch_size=8
    )
    model = build_model(cfg, card)
    params = init_model(model, seed=0)
    return cfg, val_ds, model, params


def test_rollout_math_identity():
    """With uniform attention, the rollout heatmap is flat; the math must
    row-normalize after adding the identity."""
    blocks, heads, p = 2, 2, 17  # 16 patches + CLS
    probs = np.full((blocks, heads, p, p), 1.0 / p, np.float32)
    heat = attention_rollout(probs, image_shape=(8, 8))
    assert heat.shape == (8, 8)
    assert np.isfinite(heat).all()


def test_probs_export_shape(setup):
    cfg, val_ds, model, params = setup
    batch = next(iter(val_ds["A"]))
    import jax.numpy as jnp

    cropped, _ = model.apply(
        {"params": params},
        jnp.asarray(batch["image"]),
        mouse_id="A",
        behaviors=jnp.asarray(batch["behavior"]),
        pupil_centers=jnp.asarray(batch["pupil_center"]),
        method="crop",
    )
    _, probs = model.apply(
        {"params": params},
        cropped,
        mouse_id="A",
        behaviors=jnp.asarray(batch["behavior"]),
        pupil_centers=jnp.asarray(batch["pupil_center"]),
        return_probs=True,
        method="core_forward",
    )
    # 36x64 input, patch 8 stride 4 -> 8*15=120 patches + CLS = 121
    assert probs.shape == (8, 2, 2, 121, 121)
    # rows sum to 1
    np.testing.assert_allclose(
        np.asarray(probs).sum(-1), 1.0, rtol=1e-4, atol=1e-4
    )


def test_extract_attention_maps(setup):
    cfg, val_ds, model, params = setup
    results = extract_attention_maps(
        val_ds["A"], model, params, num_samples=5, verbose=0
    )
    assert results["images"].shape[0] == 5
    assert results["heatmaps"].shape == (5, 36, 64)
    assert results["behaviors"].shape == (5, 3)
    assert results["pupil_centers"].shape == (5, 2)
    # heatmaps are min-max normalized per sample
    assert results["heatmaps"].min() >= 0 and results["heatmaps"].max() <= 1 + 1e-5
