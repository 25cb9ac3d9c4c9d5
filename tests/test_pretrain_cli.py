"""pretrain.py CLI end-to-end on a tiny ImageFolder, then inject the
pretrained core into a downstream model via --pretrain_core."""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full CLI trainings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pretrain as pretrain_cli


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("imagenet")
    rng = np.random.default_rng(0)
    for cls in ("class_a", "class_b"):
        d = root / cls
        d.mkdir()
        for i in range(20):
            arr = rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


class Args:
    mode = 0
    core = "vit"
    epochs = 2
    batch_size = 8
    limit_data = None
    resize_image = 1
    num_blocks = 1
    num_heads = 2
    emb_dim = 16
    mlp_dim = 16
    patch_size = 8
    patch_stride = 8
    p_dropout = 0.0
    t_dropout = 0.0
    core_reg_scale = 0.0
    lr = 1e-3
    seed = 0
    precision = "fp32"
    verbose = 0


def test_pretrain_classification_and_injection(image_folder, tmp_path):
    args = Args()
    args.dataset = image_folder
    args.output_dir = str(tmp_path / "pre")
    pretrain_cli.main(args)
    ckpt = os.path.join(args.output_dir, "ckpt", "model_state.msgpack")
    assert os.path.exists(ckpt)

    from v1t_tpu.utils.scheduler import load_checkpoint_file

    payload = load_checkpoint_file(ckpt)
    assert "core" in payload["model"]  # consumable by --pretrain_core
    assert "head" in payload["model"]

    # downstream injection + freeze
    from v1t_tpu.configs import Config
    from v1t_tpu.data.cards import synthetic_data_card
    from v1t_tpu.models import build_model
    from v1t_tpu.models.model import init_model
    from v1t_tpu.pretrained import load_pretrain_core

    cfg = Config(
        core="vit", readout="gaussian2d", behavior_mode=0, shift_mode=0,
        num_blocks=1, num_heads=2, emb_dim=16, mlp_dim=16, patch_size=8,
        patch_stride=8, precision="fp32", resize_image=0,
        pretrain_core=args.output_dir, verbose=0,
    )
    card = synthetic_data_card(
        mouse_ids=("A",), num_neurons=10, input_shape=(1, 36, 64)
    )
    model = build_model(cfg, card)
    params = init_model(model, seed=1)
    new_params = load_pretrain_core(cfg, params)
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(new_params["core"]),
        jax.tree_util.tree_leaves(payload["model"]["core"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pretrain_reconstruction(image_folder, tmp_path):
    args = Args()
    args.dataset = image_folder
    args.output_dir = str(tmp_path / "recon")
    args.mode = 1
    args.epochs = 1
    pretrain_cli.main(args)
    assert os.path.exists(
        os.path.join(args.output_dir, "ckpt", "model_state.msgpack")
    )


def test_pretrain_injection_partial_behavior_mode(image_folder, tmp_path):
    """The paper's workflow: a behavior-free ImageNet-pretrained core
    injected into a behavior-conditioned model. The checkpoint has no
    BehaviorMLPs — reference ``state_dict.update`` semantics keep those at
    their fresh init while everything else loads (reference
    models/utils.py:24-27); a shape mismatch must raise."""
    args = Args()
    args.dataset = image_folder
    args.output_dir = str(tmp_path / "pre_bm")
    pretrain_cli.main(args)

    import jax
    from v1t_tpu.configs import Config
    from v1t_tpu.data.cards import synthetic_data_card
    from v1t_tpu.models import build_model
    from v1t_tpu.models.model import init_model
    from v1t_tpu.pretrained import load_pretrain_core
    from v1t_tpu.utils.scheduler import load_checkpoint_file

    payload = load_checkpoint_file(
        os.path.join(args.output_dir, "ckpt", "model_state.msgpack")
    )

    def make_cfg(**kw):
        base = dict(
            core="vit", readout="gaussian2d", behavior_mode=3, shift_mode=2,
            num_blocks=1, num_heads=2, emb_dim=16, mlp_dim=16, patch_size=8,
            patch_stride=8, precision="fp32", resize_image=0,
            pretrain_core=args.output_dir, verbose=0,
        )
        base.update(kw)
        return Config(**base)

    cfg = make_cfg()
    card = synthetic_data_card(
        mouse_ids=("A",), num_neurons=10, input_shape=(1, 36, 64)
    )
    model = build_model(cfg, card)
    params = init_model(model, seed=1)
    new_params = load_pretrain_core(cfg, params)

    tr_new = new_params["core"]["transformer"]
    tr_ckpt = payload["model"]["core"]["transformer"]
    tr_init = params["core"]["transformer"]
    # loaded modules carry the checkpoint values
    np.testing.assert_array_equal(
        np.asarray(tr_new["block0_mha"]["to_qkv_kernel"]),
        np.asarray(tr_ckpt["block0_mha"]["to_qkv_kernel"]),
    )
    # behavior MLPs (absent from the checkpoint) keep the fresh init
    for a, b in zip(
        jax.tree_util.tree_leaves(tr_new["block0_bmlp"]),
        jax.tree_util.tree_leaves(tr_init["block0_bmlp"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a different emb_dim must fail loudly on the first mismatched leaf
    cfg_bad = make_cfg(emb_dim=32, num_heads=2)
    model_bad = build_model(cfg_bad, card)
    params_bad = init_model(model_bad, seed=1)
    with pytest.raises(ValueError, match="shape"):
        load_pretrain_core(cfg_bad, params_bad)


def test_pretrain_stacked2d_checkpoints_and_injects_batchnorm_stats(
    image_folder, tmp_path
):
    """BatchNorm cores: the pretrain checkpoint must carry the running
    statistics (part of the torch state_dict the reference copies,
    models/utils.py:24-27), and --pretrain_core injection must load them —
    a frozen core evaluating with fresh mean=0/var=1 stats would silently
    mis-normalize every downstream run."""
    args = Args()
    args.core = "stacked2d"
    args.dataset = image_folder
    args.output_dir = str(tmp_path / "pre_bn")
    pretrain_cli.main(args)

    import jax
    from v1t_tpu.configs import Config
    from v1t_tpu.data.cards import synthetic_data_card
    from v1t_tpu.models import build_model
    from v1t_tpu.models.model import init_model_variables
    from v1t_tpu.pretrained import load_pretrain_core
    from v1t_tpu.utils.scheduler import load_checkpoint_file

    payload = load_checkpoint_file(
        os.path.join(args.output_dir, "ckpt", "model_state.msgpack")
    )
    assert "model_state" in payload, "BatchNorm stats missing from ckpt"
    ck_stats = payload["model_state"]["batch_stats"]["core"]

    cfg = Config(
        core="stacked2d", readout="gaussian2d", behavior_mode=0, shift_mode=0,
        precision="fp32", resize_image=0, pretrain_core=args.output_dir,
        verbose=0,
    )
    card = synthetic_data_card(
        mouse_ids=("A",), num_neurons=10, input_shape=(1, 36, 64)
    )
    model = build_model(cfg, card)
    params, model_state = init_model_variables(model, seed=1)
    fresh_leaves = [
        np.asarray(x)
        for x in jax.tree_util.tree_leaves(model_state["batch_stats"]["core"])
    ]
    new_params, new_state = load_pretrain_core(cfg, params, model_state)
    got = jax.tree_util.tree_leaves(new_state["batch_stats"]["core"])
    want = jax.tree_util.tree_leaves(ck_stats)
    assert len(got) == len(want) > 0
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and they actually differ from the fresh init (pretraining moved them)
    assert any(
        not np.array_equal(np.asarray(a), f)
        for a, f in zip(got, fresh_leaves)
    )
