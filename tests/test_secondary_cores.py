"""Secondary cores: cct, stacked2d (BatchNorm state), stn — shapes, training
step, and state threading."""

import jax
import numpy as np
import pytest

from v1t_tpu import training
from v1t_tpu.configs import Config
from v1t_tpu.data import get_mouse_ids, get_training_ds
from v1t_tpu.data.cards import synthetic_data_card
from v1t_tpu.data.synthetic import generate_dataset
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model_variables


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return generate_dataset(str(root), ds_name="sensorium", mouse_ids=("A",))


def _cfg(core, data_dir, out, **kw):
    defaults = dict(
        dataset=data_dir,
        output_dir=str(out),
        core=core,
        readout="gaussian2d",
        behavior_mode=0,
        shift_mode=0,
        batch_size=8,
        num_blocks=2,
        num_layers=2,
        num_filters=8,
        emb_dim=16,
        num_heads=2,
        mlp_dim=32,
        patch_size=8,
        patch_stride=4,
        dropout=0.1,
        precision="fp32",
        resize_image=0,
        verbose=0,
        mouse_ids=["A"],
        core_reg_scale=0.0,
        readout_reg_scale=0.0,
    )
    defaults.update(kw)
    cfg = Config(**defaults)
    get_mouse_ids(cfg)
    return cfg


@pytest.mark.parametrize(
    "core",
    ["stacked2d",
     pytest.param("cct", marks=pytest.mark.slow),
     pytest.param("stn", marks=pytest.mark.slow)],
)
def test_core_forward_shapes(core):
    cfg = Config(
        core=core, behavior_mode=0, num_blocks=2, num_layers=2, num_filters=8,
        emb_dim=16, num_heads=2, mlp_dim=32, patch_size=8, patch_stride=4,
        precision="fp32", shift_mode=0, resize_image=0,
    )
    card = synthetic_data_card(
        mouse_ids=("A",), num_neurons=30, input_shape=(1, 36, 64)
    )
    model = build_model(cfg, card)
    params, state = init_model_variables(model, seed=0)
    if core in ("stacked2d", "stn"):
        assert "batch_stats" in state  # BatchNorm running stats exist
    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 1, 36, 64)).astype(np.float32)
    out, _, _ = model.apply(
        {"params": params, **state},
        images,
        mouse_id="A",
        behaviors=np.zeros((2, 3), np.float32),
        pupil_centers=np.zeros((2, 2), np.float32),
    )
    assert out.shape == (2, 30)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
@pytest.mark.parametrize("core", ["stacked2d", "stn"])
def test_bn_cores_train_and_update_stats(core, data_dir, tmp_path):
    cfg = _cfg(core, data_dir, tmp_path / core)
    train_ds, val_ds, _, card = get_training_ds(
        cfg, data_dir=cfg.dataset, mouse_ids=["A"], batch_size=8
    )
    model = build_model(cfg, card)
    params, state = init_model_variables(model, seed=0)
    trainer = training.Trainer(cfg, model, params, card, model_state=state)

    stats_before = jax.tree_util.tree_map(
        np.asarray, trainer.model_state["batch_stats"]
    )
    result = training.train_epoch(trainer, ds=train_ds, epoch=1)
    assert np.isfinite(result["loss"])
    # running statistics moved
    moved = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(
            jax.tree_util.tree_leaves(trainer.model_state["batch_stats"]),
            jax.tree_util.tree_leaves(stats_before),
        )
    )
    assert moved
    val = training.validate(trainer, ds=val_ds, epoch=1)
    assert np.isfinite(val["loss"])


@pytest.mark.slow
def test_cct_trains(data_dir, tmp_path):
    cfg = _cfg("cct", data_dir, tmp_path / "cct", behavior_mode=3, shift_mode=2,
               t_dropout=0.1, p_dropout=0.0, pos_emb="sine", drop_path=0.1)
    train_ds, _, _, card = get_training_ds(
        cfg, data_dir=cfg.dataset, mouse_ids=["A"], batch_size=8
    )
    model = build_model(cfg, card)
    params, state = init_model_variables(model, seed=0)
    trainer = training.Trainer(cfg, model, params, card, model_state=state)
    r1 = training.train_epoch(trainer, ds=train_ds, epoch=1)
    r2 = training.train_epoch(trainer, ds=train_ds, epoch=2)
    r3 = training.train_epoch(trainer, ds=train_ds, epoch=3)
    assert r3["loss"] < r1["loss"]


# --- stacked2d architecture variants (reference stacked2d.py:19-117, 277-312,
# --- 315-601) -----------------------------------------------------------------


def _stacked2d_model(**kw):
    cfg = Config(
        core="stacked2d", behavior_mode=0, num_layers=3, precision="fp32",
        shift_mode=0, resize_image=0, dropout=0.1, **kw,
    )
    card = synthetic_data_card(
        mouse_ids=("A",), num_neurons=30, input_shape=(1, 36, 64)
    )
    model = build_model(cfg, card)
    params, state = init_model_variables(model, seed=0)
    return cfg, model, params, state


def _forward(model, params, state, train=False):
    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 1, 36, 64)).astype(np.float32)
    kwargs = dict(
        mouse_id="A",
        behaviors=np.zeros((2, 3), np.float32),
        pupil_centers=np.zeros((2, 2), np.float32),
    )
    if train:
        out, _ = model.apply(
            {"params": params, **state}, images, train=True,
            rngs={"dropout": jax.random.key(0), "sample": jax.random.key(1)},
            mutable=["batch_stats"], **kwargs,
        )
        out = out[0]
    else:
        out, _, _ = model.apply({"params": params, **state}, images, **kwargs)
    return np.asarray(out)


@pytest.mark.parametrize(
    "conv_type",
    [pytest.param("attention", marks=pytest.mark.slow), "conv"],
)
def test_stacked2d_conv_types(conv_type):
    cfg, model, params, state = _stacked2d_model(
        stacked2d_conv_type=conv_type
    )
    out = _forward(model, params, state)
    assert out.shape == (2, 30) and np.isfinite(out).all()
    core_params = params["core"]
    if conv_type == "attention":
        att = core_params["layer1_attention_conv"]
        assert set(att) >= {"rel_h", "rel_w", "query_conv", "key_conv", "value_conv"}
    else:
        assert "kernel" in core_params["layer1_conv"]


@pytest.mark.slow
def test_stacked2d_conv_gradients_and_group_sparsity():
    from v1t_tpu.models.cores.stacked2d import Stacked2dCore

    cfg, model, params, state = _stacked2d_model(
        stacked2d_conv_type="conv", core_reg_hidden=0.5
    )
    reg = Stacked2dCore.regularizer(
        params["core"], reg_scale=0.0, gamma_input=1.0, gamma_hidden=0.5
    )
    reg_no_hidden = Stacked2dCore.regularizer(
        params["core"], reg_scale=0.0, gamma_input=1.0, gamma_hidden=0.0
    )
    assert float(reg) > float(reg_no_hidden)  # group sparsity contributes

    def loss(p):
        rng = np.random.default_rng(0)
        images = rng.normal(size=(2, 1, 36, 64)).astype(np.float32)
        out, _, _ = model.apply(
            {"params": p, **state}, images, mouse_id="A",
            behaviors=np.zeros((2, 3), np.float32),
            pupil_centers=np.zeros((2, 2), np.float32),
        )
        return (out ** 2).sum()

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads["core"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_stacked2d_skip_and_stack():
    # stack=0 -> concat of all 3 layers' maps; skip=2 -> dense-ish wiring
    cfg, model, params, state = _stacked2d_model(
        stacked2d_skip=2, stacked2d_stack=0
    )
    from v1t_tpu.models.cores.stacked2d import Stacked2dCore

    core = Stacked2dCore.from_config(
        cfg, image_shape=(1, 36, 64), mouse_ids=("A",)
    )
    assert core.stack_layers == (0, 1, 2)
    assert core.output_shape[0] == core.hidden_channels * 3
    out = _forward(model, params, state)
    assert out.shape == (2, 30) and np.isfinite(out).all()


def test_stacked2d_bn_variants():
    # decomposed affine: BN without scale/bias + explicit Bias2D layer
    cfg, model, params, state = _stacked2d_model(
        stacked2d_independent_bn_bias=0, stacked2d_batch_norm_scale=0,
    )
    core_params = params["core"]
    assert "layer0_bias2d" in core_params
    assert "scale" not in core_params.get("layer0_norm", {})
    out = _forward(model, params, state, train=True)
    assert np.isfinite(out).all()

    # scale variant: Scale2D except on the final layer
    cfg, model, params, state = _stacked2d_model(
        stacked2d_independent_bn_bias=0, stacked2d_final_batchnorm_scale=0,
    )
    core_params = params["core"]
    assert "layer0_scale2d" in core_params
    assert "layer2_bias2d" in core_params  # final layer falls back to bias
    out = _forward(model, params, state, train=True)
    assert np.isfinite(out).all()

    # no batch norm at all: layer0 conv gains a bias
    cfg, model, params, state = _stacked2d_model(stacked2d_batch_norm=0)
    assert "bias" in params["core"]["layer0_conv"]
    out = _forward(model, params, state)
    assert np.isfinite(out).all()
