"""Cross-framework full-model parity: construct the ACTUAL reference
implementation (/root/reference/src/v1t, PyTorch), transplant its weights
into this framework via v1t_tpu/utils/torch_transplant.py, and assert
end-to-end forward and gradient equality.

Op-level parity tests (grid_sample, losses, inits) cannot catch composition
bugs — module ordering, dtype boundaries, per-mouse wiring. This harness
runs the two complete models side by side and is the strongest available
proxy for the ~0.29 single-trial-correlation target while the real archives
are unavailable (BASELINE.md; reference src/v1t/models/model.py:151-177).
"""

import sys
import types

import numpy as np
import pytest

from v1t_tpu.configs import Config
from v1t_tpu.data.cards import synthetic_data_card
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model
from v1t_tpu.utils.torch_transplant import (
    assert_tree_shapes_match,
    convert_state_dict,
)

torch = pytest.importorskip("torch")

REFERENCE_SRC = "/root/reference/src"


def _install_stubs():
    """The image has no torchvision/torchinfo; stub the two call sites the
    reference model path touches (transforms.Resize == bilinear interpolate
    with align_corners=False, torchvision _functional_tensor.resize)."""
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            import torch.nn.functional as F

            tv = types.ModuleType("torchvision")
            transforms = types.ModuleType("torchvision.transforms")

            class Resize:
                def __init__(self, size, antialias=None):
                    self.size = tuple(size)
                    self.antialias = bool(antialias)

                def __call__(self, x):
                    return F.interpolate(
                        x, size=self.size, mode="bilinear",
                        align_corners=False, antialias=self.antialias,
                    )

            transforms.Resize = Resize

            # torchvision.transforms.functional.resize (used by the
            # reference attention_rollout.py:8,121 with antialias=False)
            functional = types.ModuleType("torchvision.transforms.functional")

            def resize(img, size, antialias=None):
                x = img
                unsqueeze = x.dim() == 3
                if unsqueeze:
                    x = x[None]
                out = F.interpolate(
                    x, size=tuple(size), mode="bilinear",
                    align_corners=False, antialias=bool(antialias),
                )
                return out[0] if unsqueeze else out

            functional.resize = resize
            transforms.functional = functional
            tv.transforms = transforms
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = transforms
            sys.modules["torchvision.transforms.functional"] = functional
    if "torchinfo" not in sys.modules:
        try:
            import torchinfo  # noqa: F401
        except ImportError:
            ti = types.ModuleType("torchinfo")
            ti.summary = lambda *a, **k: types.SimpleNamespace(
                trainable_params=0
            )
            sys.modules["torchinfo"] = ti
    # the reference's tensorboard module uses the pre-3.6 matplotlib style
    # name at import time — alias it so the import chain succeeds
    import matplotlib.style

    lib = matplotlib.style.library
    for name in list(lib):
        legacy = name.replace("seaborn-v0_8", "seaborn")
        if legacy not in lib:
            lib[legacy] = lib[name]


def _reference_model(cfg: Config, card):
    """Build the reference torch Model from a Config + DataCard."""
    _install_stubs()
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    from v1t.models.model import Model as RefModel

    args = types.SimpleNamespace(
        core=cfg.core,
        readout=cfg.readout,
        output_shapes={
            m: (card.neuron_cards[m].num_neurons,) for m in card.mouse_ids
        },
        input_shape=tuple(card.input_shape),
        shift_mode=cfg.shift_mode,
        behavior_mode=cfg.behavior_mode,
        center_crop=cfg.center_crop,
        resize_image=cfg.resize_image,
        ds_name=card.ds_name,
        core_reg_scale=cfg.core_reg_scale,
        readout_reg_scale=cfg.readout_reg_scale,
        cropper_reg_scale=0.0,
        shifter_reg_scale=0.0,
        patch_mode=cfg.patch_mode,
        patch_size=cfg.patch_size,
        patch_stride=cfg.patch_stride,
        emb_dim=cfg.emb_dim,
        num_blocks=cfg.num_blocks,
        num_heads=cfg.num_heads,
        mlp_dim=cfg.mlp_dim,
        p_dropout=cfg.p_dropout,
        t_dropout=cfg.t_dropout,
        drop_path=cfg.drop_path,
        use_lsa=cfg.use_lsa,
        disable_bias=cfg.disable_bias,
        grad_checkpointing=False,
        verbose=0,
        device=torch.device("cpu"),
        disable_grid_predictor=cfg.disable_grid_predictor,
        grid_predictor_dim=cfg.grid_predictor_dim,
        bias_mode=cfg.bias_mode,
        mouse_ids=list(card.mouse_ids),
        pos_emb=getattr(cfg, "pos_emb", "sine"),
        num_layers=getattr(cfg, "num_layers", 4),
        num_filters=getattr(cfg, "num_filters", 8),
        dropout=getattr(cfg, "dropout", 0.0),
        core_reg_input=getattr(cfg, "core_reg_input", 0.0),
        core_reg_hidden=getattr(cfg, "core_reg_hidden", 0.0),
        linear=False,
    )
    ds = {
        m: types.SimpleNamespace(
            dataset=types.SimpleNamespace(
                coordinates=np.asarray(
                    card.neuron_cards[m].coordinates, np.float32
                ),
                response_stats={
                    "mean": np.asarray(
                        card.neuron_cards[m].response_mean, np.float32
                    ),
                    "std": np.asarray(
                        card.neuron_cards[m].response_std, np.float32
                    ),
                },
            )
        )
        for m in card.mouse_ids
    }
    torch.manual_seed(cfg.seed)
    model = RefModel(args, ds=ds)
    model.eval()
    return model


def _make_case(cfg: Config, card):
    """Reference model + transplanted JAX model, structurally verified."""
    ref = _reference_model(cfg, card)
    sd = ref.state_dict()
    cfg.mouse_ids = list(card.mouse_ids)
    params = convert_state_dict(sd, cfg)
    model = build_model(cfg, card)
    init_params = init_model(model, seed=0)
    assert_tree_shapes_match(params, init_params)
    import jax

    params = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params)
    return ref, model, params


def _config(**kw):
    defaults = dict(
        core="vit", readout="gaussian2d", behavior_mode=0, shift_mode=0,
        precision="fp32", attention_impl="xla", resize_image=0,
        num_blocks=2, emb_dim=16, num_heads=2, mlp_dim=32,
        patch_size=8, patch_stride=4, p_dropout=0.1, t_dropout=0.2,
        core_reg_scale=0.1, readout_reg_scale=0.01, seed=11,
    )
    defaults.update(kw)
    return Config(**defaults)


def _card(**kw):
    defaults = dict(
        mouse_ids=("A", "B"), num_neurons=(40, 30),
        input_shape=(1, 36, 64), ds_size=64,
    )
    defaults.update(kw)
    return synthetic_data_card(**defaults)


def _inputs(card, batch=4, seed=5):
    rng = np.random.default_rng(seed)
    c, h, w = card.input_shape
    return (
        rng.normal(size=(batch, c, h, w)).astype(np.float32),
        rng.normal(size=(batch, 3)).astype(np.float32),
        rng.normal(size=(batch, 2)).astype(np.float32) * 0.3,
    )


def _forward_both(ref, model, params, card, mouse_id, batch=4):
    images, behaviors, pupils = _inputs(card)
    with torch.no_grad():
        t_out, t_img, t_grid = ref(
            torch.from_numpy(images),
            mouse_id=mouse_id,
            behaviors=torch.from_numpy(behaviors),
            pupil_centers=torch.from_numpy(pupils),
        )
    j_out, j_img, j_grid = model.apply(
        {"params": params}, images, mouse_id=mouse_id,
        behaviors=behaviors, pupil_centers=pupils, train=False,
    )
    return (
        (t_out.numpy(), t_img.numpy(), t_grid.numpy()),
        (np.asarray(j_out), np.asarray(j_img), np.asarray(j_grid)),
    )


def _assert_forward_parity(cfg, card, rtol=2e-5, atol=2e-5):
    ref, model, params = _make_case(cfg, card)
    for mouse_id in card.mouse_ids:
        (t_out, t_img, t_grid), (j_out, j_img, j_grid) = _forward_both(
            ref, model, params, card, mouse_id
        )
        np.testing.assert_allclose(
            j_img, t_img, rtol=rtol, atol=atol,
            err_msg=f"cropped images diverged (mouse {mouse_id})",
        )
        np.testing.assert_allclose(
            j_grid, t_grid, rtol=rtol, atol=atol,
            err_msg=f"image grids diverged (mouse {mouse_id})",
        )
        np.testing.assert_allclose(
            j_out, t_out, rtol=rtol, atol=atol,
            err_msg=f"model outputs diverged (mouse {mouse_id})",
        )


# --- the VERDICT matrix: vit + gaussian2d over behavior x shift modes ----------


@pytest.mark.slow  # the full matrix; the flagship cell stays fast below
@pytest.mark.parametrize("behavior_mode", [0, 2, 3, 4])
@pytest.mark.parametrize("shift_mode", [0, 2, 4])
def test_vit_gaussian2d_forward_parity(behavior_mode, shift_mode):
    cfg = _config(behavior_mode=behavior_mode, shift_mode=shift_mode)
    _assert_forward_parity(cfg, _card())


def test_vit_gaussian2d_flagship_forward_parity():
    # the tuned-defaults cell of the matrix, kept in the fast selection
    _assert_forward_parity(_config(behavior_mode=3, shift_mode=2), _card())


@pytest.mark.slow
@pytest.mark.parametrize("patch_mode", [1, 2, 3])
def test_vit_patch_modes_forward_parity(patch_mode):
    cfg = _config(patch_mode=patch_mode)
    _assert_forward_parity(cfg, _card())


def test_vit_lsa_forward_parity():
    _assert_forward_parity(_config(use_lsa=True, behavior_mode=3,
                                   shift_mode=2), _card())


@pytest.mark.slow
def test_vit_behavior_channels_forward_parity():
    # behavior_mode 1: behavior appended as image channels in the cropper
    _assert_forward_parity(_config(behavior_mode=1), _card())


@pytest.mark.slow
def test_vit_resize_and_crop_forward_parity():
    # center_crop + per-mouse cropper shifter + bilinear resize to (36, 64)
    cfg = _config(behavior_mode=3, shift_mode=4, center_crop=0.8,
                  resize_image=1, patch_stride=8)
    _assert_forward_parity(cfg, _card(input_shape=(1, 72, 128)))


@pytest.mark.slow
def test_vit_free_mu_forward_parity():
    cfg = _config(disable_grid_predictor=True, behavior_mode=2, shift_mode=2)
    _assert_forward_parity(cfg, _card())


@pytest.mark.slow
def test_vit_bias_mode2_forward_parity():
    _assert_forward_parity(_config(bias_mode=2, behavior_mode=3,
                                   shift_mode=2), _card())


@pytest.mark.parametrize("readout", ["dense", "linear"])
def test_secondary_readouts_forward_parity(readout):
    cfg = _config(readout=readout, behavior_mode=2, shift_mode=0)
    if readout == "dense":
        # reference bug: DenseReadout.forward names its kwarg ``shift``
        # (dense.py:39) but Readouts.forward dispatches ``shifts=``
        # (readout.py:85) — the reference dense readout is uncallable
        # through Model. Patch the signature so the math itself can be
        # compared; our implementation accepts ``shifts`` like the others.
        _install_stubs()
        if REFERENCE_SRC not in sys.path:
            sys.path.insert(0, REFERENCE_SRC)
        from v1t.models.readout.dense import DenseReadout as RefDense

        RefDense.forward = lambda self, inputs, shifts=None: self.dense(inputs)
    _assert_forward_parity(cfg, _card())


@pytest.mark.slow
def test_cct_forward_parity():
    cfg = _config(core="cct", behavior_mode=3, shift_mode=2, pos_emb="sine",
                  patch_stride=2)
    _assert_forward_parity(cfg, _card())


def _assert_stateful_forward_parity(cfg, card):
    """Cores with BatchNorm: transplant running statistics alongside the
    parameters and compare eval-mode forwards."""
    from v1t_tpu.utils.torch_transplant import convert_batch_stats

    ref = _reference_model(cfg, card)
    # advance the BatchNorm running statistics off their fresh (0, 1) state
    # so the statistics transplant is actually exercised
    images, behaviors, pupils = _inputs(card, seed=99)
    ref.train(True)
    with torch.no_grad():
        for m in card.mouse_ids:
            ref(
                torch.from_numpy(images), mouse_id=m,
                behaviors=torch.from_numpy(behaviors),
                pupil_centers=torch.from_numpy(pupils),
            )
    ref.eval()
    sd = ref.state_dict()
    cfg.mouse_ids = list(card.mouse_ids)
    params = convert_state_dict(sd, cfg)
    state = convert_batch_stats(sd, cfg)
    model = build_model(cfg, card)
    from v1t_tpu.models.model import init_model_variables

    init_params, init_state = init_model_variables(model, seed=0)
    assert_tree_shapes_match(params, init_params)
    assert_tree_shapes_match(state, init_state)
    images, behaviors, pupils = _inputs(card)
    for mouse_id in card.mouse_ids:
        with torch.no_grad():
            t_out, _, _ = ref(
                torch.from_numpy(images), mouse_id=mouse_id,
                behaviors=torch.from_numpy(behaviors),
                pupil_centers=torch.from_numpy(pupils),
            )
        j_out, _, _ = model.apply(
            {"params": params, **state}, images, mouse_id=mouse_id,
            behaviors=behaviors, pupil_centers=pupils, train=False,
        )
        np.testing.assert_allclose(
            np.asarray(j_out), t_out.numpy(), rtol=3e-5, atol=3e-5,
            err_msg=f"{cfg.core} outputs diverged (mouse {mouse_id})",
        )


@pytest.mark.slow
def test_stacked2d_forward_parity():
    cfg = _config(core="stacked2d", behavior_mode=0, shift_mode=2,
                  num_layers=3, dropout=0.1, core_reg_input=1.0,
                  core_reg_hidden=0.0)
    # perturb the running stats so the comparison is not vacuous at the
    # fresh-BN (mean 0, var 1) point
    _assert_stateful_forward_parity(cfg, _card(input_shape=(1, 24, 36)))


@pytest.mark.parametrize("core", ["stacked2d", "stn"])
def test_batchnorm_update_dynamics_parity(core):
    """Two TRAIN-mode forwards must leave identical BatchNorm running
    statistics in both frameworks — pinning torch's update rule (momentum
    0.1 == flax 0.9, UNBIASED variance in the running update while the
    batch is normalized with the biased one; torch _BatchNorm.forward).
    The forward-parity tests transplant already-updated statistics, so the
    update rule itself is only covered here."""
    import jax

    from v1t_tpu.models.model import init_model_variables
    from v1t_tpu.utils.torch_transplant import convert_batch_stats

    if core == "stacked2d":
        cfg = _config(core=core, behavior_mode=0, shift_mode=0,
                      num_layers=3, dropout=0.0, core_reg_input=1.0,
                      core_reg_hidden=0.0)
    else:
        cfg = _config(core=core, behavior_mode=0, shift_mode=0,
                      num_layers=3, num_filters=8, dropout=0.0)
    card = _card(input_shape=(1, 24, 36), mouse_ids=("A",), num_neurons=(40,))
    ref = _reference_model(cfg, card)
    cfg.mouse_ids = list(card.mouse_ids)
    params = convert_state_dict(ref.state_dict(), cfg)
    model = build_model(cfg, card)
    _, state = init_model_variables(model, seed=0)

    ref.train(True)
    rng = jax.random.key(7)
    for step in range(2):
        images, behaviors, pupils = _inputs(card, seed=50 + step)
        with torch.no_grad():
            ref(
                torch.from_numpy(images), mouse_id="A",
                behaviors=torch.from_numpy(behaviors),
                pupil_centers=torch.from_numpy(pupils),
            )
        # the readout's stochastic grid sampling uses framework-specific
        # RNG, so outputs are not comparable in train mode — but every BN
        # layer's running stats see the previous BN layer's train-mode
        # output, so stats equality transitively pins the train-mode
        # normalization as well
        _, state = model.apply(
            {"params": params, **state}, images, mouse_id="A",
            behaviors=behaviors, pupil_centers=pupils, train=True,
            mutable=["batch_stats"],
            rngs={
                "sample": jax.random.fold_in(rng, step),
                "dropout": jax.random.fold_in(rng, 10 + step),
                "droppath": jax.random.fold_in(rng, 20 + step),
            },
        )
    # running statistics after two updates
    want = convert_batch_stats(ref.state_dict(), cfg)["batch_stats"]
    flat_want = jax.tree_util.tree_flatten_with_path(want)[0]
    flat_got = dict(
        jax.tree_util.tree_flatten_with_path(state["batch_stats"])[0]
    )
    assert flat_want, "no running statistics found to compare"
    for path, leaf in flat_want:
        np.testing.assert_allclose(
            np.asarray(flat_got[path]), np.asarray(leaf),
            rtol=1e-5, atol=1e-6,
            err_msg=f"running stats diverged at {jax.tree_util.keystr(path)}",
        )


@pytest.mark.slow
def test_stn_forward_parity():
    cfg = _config(core="stn", behavior_mode=0, shift_mode=2, num_layers=3,
                  num_filters=8, dropout=0.1)
    _assert_stateful_forward_parity(cfg, _card(input_shape=(1, 24, 36)))


@pytest.mark.slow
def test_ensemble_mode2_parity():
    """Ensemble composition (reference ensemble.py:131-151 + OutputModule
    mode 2): two transplanted sub-models, per-mouse Linear over the model
    axis, ELU1 — our EnsembleModel must match the reference math."""
    import jax.numpy as jnp

    from v1t_tpu.models.ensemble import EnsembleModel
    from v1t_tpu.ops.common import elu1  # noqa: F401 (semantics under test)

    card = _card()
    cfg_a = _config(behavior_mode=3, shift_mode=2, seed=11)
    cfg_b = _config(behavior_mode=2, shift_mode=0, seed=23, num_blocks=1)
    ref_a, model_a, params_a = _make_case(cfg_a, card)
    ref_b, model_b, params_b = _make_case(cfg_b, card)

    ens_cfg = Config(
        core="vit", readout="gaussian2d", behavior_mode=3, shift_mode=2,
        precision="fp32", ensemble_mode=2,
    )
    ens = EnsembleModel(
        model_configs=(("m0", cfg_a), ("m1", cfg_b)),
        data_card=card,
        ensemble_mode=2,
    )
    rng = np.random.default_rng(41)
    head = {
        f"linear_{m}": {
            "kernel": rng.normal(size=(2, 1)).astype(np.float32) * 0.1,
            "bias": rng.normal(size=(1,)).astype(np.float32) * 0.1,
        }
        for m in card.mouse_ids
    }
    params = {
        "ensemble_m0": params_a,
        "ensemble_m1": params_b,
        "output_module": head,
    }

    images, behaviors, pupils = _inputs(card)
    for mouse_id in card.mouse_ids:
        with torch.no_grad():
            outs = []
            for ref in (ref_a, ref_b):
                o, _, _ = ref(
                    torch.from_numpy(images), mouse_id=mouse_id,
                    behaviors=torch.from_numpy(behaviors),
                    pupil_centers=torch.from_numpy(pupils), activate=False,
                )
                outs.append(o.numpy()[..., None])
        stacked = np.concatenate(outs, axis=-1)  # (B, N, 2)
        w = head[f"linear_{mouse_id}"]["kernel"][:, 0]
        b = head[f"linear_{mouse_id}"]["bias"][0]
        lin = stacked @ w + b
        t_out = np.where(lin > 0, lin + 1.0, np.exp(np.minimum(lin, 0.0)))

        j_out, _, _ = ens.apply(
            {"params": params}, images, mouse_id=mouse_id,
            behaviors=behaviors, pupil_centers=pupils, train=False,
        )
        np.testing.assert_allclose(
            np.asarray(j_out), t_out, rtol=2e-5, atol=2e-5,
            err_msg=f"ensemble outputs diverged (mouse {mouse_id})",
        )


@pytest.mark.slow
def test_three_step_training_dynamics_parity():
    """Optimizer-level parity: three AdamW steps on identical data must
    leave the two frameworks' parameters equal leaf for leaf — pinning the
    per-module LR groups (core_lr vs lr, reference model.py:112-139 /
    train.py:217-223 with weight_decay=0), Adam bias-correction numerics,
    and the regularizer composition (core L1 + readout |features| L1 +
    shifter L1) that feeds the total loss."""
    import jax
    import jax.numpy as jnp

    from v1t_tpu import optim as vopt
    from v1t_tpu.models import model_regularizer

    cfg = _config(
        behavior_mode=3, shift_mode=2, p_dropout=0.0, t_dropout=0.0,
        lr=1e-3, core_lr=4e-4, core_reg_scale=0.05, readout_reg_scale=0.01,
    )
    card = _card()
    ref, model, params = _make_case(cfg, card)
    mouse_id = "A"
    images, behaviors, pupils = _inputs(card)
    target = np.random.default_rng(7).poisson(2.0, (4, 40)).astype(np.float32)
    eps = float(np.finfo(np.float32).eps)

    # torch side: AdamW param groups exactly as the reference builds them
    groups = ref.get_parameters(core_lr=cfg.core_lr)
    t_opt = torch.optim.AdamW(
        groups, lr=cfg.lr, betas=(cfg.adam_beta1, cfg.adam_beta2),
        eps=cfg.adam_eps, weight_decay=0.0,
    )
    t_in = (
        torch.from_numpy(images), torch.from_numpy(behaviors),
        torch.from_numpy(pupils), torch.from_numpy(target) + eps,
    )
    ref.train(False)  # deterministic forward (mu, no dropout) on both sides
    for _ in range(3):
        t_opt.zero_grad()
        out, _, _ = ref(
            t_in[0], mouse_id=mouse_id, behaviors=t_in[1],
            pupil_centers=t_in[2],
        )
        loss = torch.sum((out + eps) - t_in[3] * torch.log(out + eps))
        total = loss + ref.regularizer(mouse_id=mouse_id)
        total.backward()
        t_opt.step()

    # jax side: the shipped optimizer + regularizer
    tx, opt_state = vopt.build_optimizer(cfg, params)

    def loss_fn(p):
        out, _, _ = model.apply(
            {"params": p}, images, mouse_id=mouse_id, behaviors=behaviors,
            pupil_centers=pupils, train=False,
        )
        loss = jnp.sum((out + eps) - (target + eps) * jnp.log(out + eps))
        return loss + model_regularizer(cfg, p, mouse_id=mouse_id)

    for _ in range(3):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), params, updates
        )

    t_params = convert_state_dict(ref.state_dict(), cfg)
    flat_t = jax.tree_util.tree_flatten_with_path(t_params)[0]
    flat_j = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    for path, t_leaf in flat_t:
        # atol budget: Adam normalizes each update to ~lr regardless of
        # gradient magnitude, so for leaves whose raw gradient is tiny
        # (zero-init biases) cross-framework fp noise in the gradient can
        # shift individual updates by a few e-5. A real bug in the LR
        # groups, bias correction, or regularizer shifts leaves by a full
        # lr per step (>= 1.2e-3 over 3 steps) — an order of magnitude
        # above this tolerance.
        np.testing.assert_allclose(
            np.asarray(flat_j[path]), np.asarray(t_leaf),
            rtol=5e-4, atol=1e-4,
            err_msg=f"params diverged after 3 steps at "
                    f"{jax.tree_util.keystr(path)}",
        )


def test_vit_gaussian2d_gradient_parity():
    """Poisson-loss gradients must agree leaf for leaf across frameworks —
    the torch grads are converted through the SAME mapping, so every
    parameter is compared (reference losses.py:141-166 Poisson semantics)."""
    import jax
    import jax.numpy as jnp

    cfg = _config(behavior_mode=3, shift_mode=2)
    card = _card()
    ref, model, params = _make_case(cfg, card)
    mouse_id = "A"
    images, behaviors, pupils = _inputs(card)
    rng = np.random.default_rng(7)
    target = rng.poisson(2.0, size=(4, 40)).astype(np.float32)
    eps = float(np.finfo(np.float32).eps)

    # torch side
    ref.train(False)
    t_out, _, _ = ref(
        torch.from_numpy(images), mouse_id=mouse_id,
        behaviors=torch.from_numpy(behaviors),
        pupil_centers=torch.from_numpy(pupils),
    )
    t_target = torch.from_numpy(target) + eps
    t_pred = t_out + eps
    t_loss = torch.sum(t_pred - t_target * torch.log(t_pred))
    t_loss.backward()
    grad_sd = {
        k: v.grad if v.grad is not None else torch.zeros_like(v)
        for k, v in ref.named_parameters()
    }
    t_grads = convert_state_dict(grad_sd, cfg)

    # jax side
    def loss_fn(p):
        out, _, _ = model.apply(
            {"params": p}, images, mouse_id=mouse_id, behaviors=behaviors,
            pupil_centers=pupils, train=False,
        )
        pred = out + eps
        return jnp.sum(pred - (target + eps) * jnp.log(pred))

    j_loss, j_grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-5)

    flat_t = jax.tree_util.tree_flatten_with_path(t_grads)[0]
    flat_j = dict(jax.tree_util.tree_flatten_with_path(j_grads)[0])
    # mouse B's per-mouse modules got no gradient from mouse A's loss on the
    # torch side (zeros); jax agrees by construction — compare everything
    for path, t_leaf in flat_t:
        j_leaf = np.asarray(flat_j[path])
        np.testing.assert_allclose(
            j_leaf, np.asarray(t_leaf), rtol=1e-4, atol=1e-5,
            err_msg=f"gradient diverged at {jax.tree_util.keystr(path)}",
        )


@pytest.mark.slow  # ~2 min: imports the reference rollout stack + 2 compiles
def test_attention_rollout_reference_parity():
    """Interpretability parity (SURVEY §2.10): the exported post-softmax
    attention probabilities and the rollout heatmaps must match the actual
    reference Recorder + attention_rollout implementation
    (reference src/v1t/utils/attention_rollout.py:15-133) on transplanted
    weights."""
    import jax.numpy as jnp

    from v1t_tpu.analysis.attention_rollout import attention_rollouts

    cfg = _config(behavior_mode=3, shift_mode=0)
    card = _card(mouse_ids=("A",), num_neurons=(40,))
    ref, model, params = _make_case(cfg, card)
    from v1t.utils import attention_rollout as ref_rollout

    mouse_id = card.mouse_ids[0]
    images, behaviors, pupils = _inputs(card)

    cropped, _ = model.apply(
        {"params": params}, images, mouse_id=mouse_id, behaviors=behaviors,
        pupil_centers=pupils, method="crop",
    )
    _, j_probs = model.apply(
        {"params": params}, jnp.asarray(cropped), mouse_id=mouse_id,
        behaviors=behaviors, pupil_centers=pupils, train=False,
        return_probs=True, method="core_forward",
    )

    recorder = ref_rollout.Recorder(ref.core)
    with torch.no_grad():
        _, t_probs = recorder(
            images=torch.from_numpy(np.asarray(cropped)),
            behaviors=torch.from_numpy(behaviors),
            pupil_centers=torch.from_numpy(pupils),
            mouse_id=mouse_id,
        )
    recorder.eject()

    j_probs = np.asarray(j_probs, np.float32)
    assert j_probs.shape == tuple(t_probs.shape), (
        f"probs shape {j_probs.shape} != reference {tuple(t_probs.shape)}"
    )
    np.testing.assert_allclose(
        j_probs, t_probs.numpy(), rtol=2e-5, atol=2e-5,
        err_msg="post-softmax attention probabilities diverged",
    )

    image_shape = tuple(np.asarray(cropped).shape[2:])
    j_heat = attention_rollouts(j_probs, image_shape=image_shape)
    with torch.no_grad():
        t_heat = ref_rollout.attention_rollouts(
            t_probs, image_shape=list(image_shape)
        )
    np.testing.assert_allclose(
        j_heat, t_heat.numpy(), rtol=1e-4, atol=1e-4,
        err_msg="attention rollout heatmaps diverged",
    )


@pytest.mark.slow
def test_fifty_step_training_dynamics_parity_with_rollback(tmp_path):
    """Long-horizon optimizer + scheduler dynamics parity (VERDICT r3 #3):
    50+ epochs of single-batch AdamW steps with ds_scale ON, driven through
    BOTH frameworks' plateau schedulers (reference scheduler.py:173-197 vs
    v1t_tpu/utils/scheduler.py) with lr_patience=3 — the run must cross at
    least one plateau ROLLBACK (best-checkpoint restore + 0.3x LR decay,
    optimizer moments kept) and terminate after max_reduce reductions, with
    every parameter leaf still matching across frameworks at the end.

    The monitored value is computed on a held-out batch on each side and
    asserted close; the TORCH value drives both schedulers so the state
    machines see bit-identical inputs (decision parity is asserted via the
    reduction epochs; value parity via the per-epoch tolerance)."""
    import types

    import jax
    import jax.numpy as jnp

    from v1t_tpu import optim as vopt
    from v1t_tpu.losses import correlation as np_correlation
    from v1t_tpu.losses import get_criterion
    from v1t_tpu.models import model_regularizer
    from v1t_tpu.utils.scheduler import Scheduler as JaxScheduler

    cfg = _config(
        behavior_mode=3, shift_mode=2, p_dropout=0.0, t_dropout=0.0,
        lr=6e-3, core_lr=2.5e-3, core_reg_scale=0.05, readout_reg_scale=0.01,
        ds_scale=True, batch_size=4,
    )
    card = _card()
    ref, model, params = _make_case(cfg, card)
    mouse_id = "A"
    images, behaviors, pupils = _inputs(card, batch=4, seed=5)
    v_images, v_behaviors, v_pupils = _inputs(card, batch=4, seed=99)
    rng = np.random.default_rng(7)
    target = rng.poisson(2.0, (4, 40)).astype(np.float32)
    # val responses correlated with the train structure but noisy, so val
    # correlation rises then plateaus as the model overfits the train batch
    v_target = rng.poisson(2.0, (4, 40)).astype(np.float32)

    ds_size = 64  # drives the sqrt(ds_size/batch) ds_scale on both sides

    # --- torch side: reference criterion + AdamW + reference Scheduler ----
    sys.path.insert(0, REFERENCE_SRC) if REFERENCE_SRC not in sys.path else None
    from v1t import losses as ref_losses
    from v1t.utils.scheduler import Scheduler as RefScheduler

    args = types.SimpleNamespace(
        criterion="poisson", ds_scale=True, device=torch.device("cpu")
    )
    ref_ds = {
        m: types.SimpleNamespace(dataset=list(range(ds_size)))
        for m in card.mouse_ids
    }
    t_crit = ref_losses.get_criterion(args, ds=ref_ds)
    groups = ref.get_parameters(core_lr=cfg.core_lr)
    t_opt = torch.optim.AdamW(
        groups, lr=cfg.lr, betas=(cfg.adam_beta1, cfg.adam_beta2),
        eps=cfg.adam_eps, weight_decay=0.0,
    )
    sched_args = types.SimpleNamespace(
        output_dir=str(tmp_path / "ref"), device=torch.device("cpu"),
        verbose=0,
    )
    from v1t_tpu.utils.reference_bridge import install_stubs

    install_stubs()  # torch>=2.6 safe-globals for the reference checkpoint
    t_sched = RefScheduler(
        sched_args, model=ref, optimizer=t_opt, scaler=None,
        save_optimizer=False, save_scheduler=False, mode="max",
        lr_patience=3, max_reduce=2,
    )

    # --- jax side: shipped criterion/optimizer/scheduler ------------------
    j_cfg = cfg
    j_cfg.output_dir = str(tmp_path / "jax")
    j_crit = get_criterion(j_cfg, {m: ds_size for m in card.mouse_ids})
    tx, opt_state = vopt.build_optimizer(j_cfg, params)
    j_sched = JaxScheduler(
        j_cfg, mode="max", lr_patience=3, max_reduce=2,
        save_optimizer=False, save_scheduler=False,
    )

    t_in = (
        torch.from_numpy(images), torch.from_numpy(behaviors),
        torch.from_numpy(pupils), torch.from_numpy(target),
    )
    t_val = (
        torch.from_numpy(v_images), torch.from_numpy(v_behaviors),
        torch.from_numpy(v_pupils),
    )
    ref.train(False)  # deterministic forward on both sides

    def j_loss_fn(p):
        out, _, _ = model.apply(
            {"params": p}, images, mouse_id=mouse_id, behaviors=behaviors,
            pupil_centers=pupils, train=False,
        )
        loss = j_crit(target, out, mouse_id=mouse_id, batch_size=4)
        return loss + model_regularizer(j_cfg, p, mouse_id=mouse_id)

    j_grad = jax.jit(jax.value_and_grad(j_loss_fn))

    @jax.jit
    def j_predict(p):
        out, _, _ = model.apply(
            {"params": p}, v_images, mouse_id=mouse_id,
            behaviors=v_behaviors, pupil_centers=v_pupils, train=False,
        )
        return out

    t_reductions, j_reductions = [], []
    t_stop = j_stop = None
    max_epochs = 60
    for epoch in range(1, max_epochs + 1):
        # torch step
        t_opt.zero_grad()
        out, _, _ = ref(
            t_in[0], mouse_id=mouse_id, behaviors=t_in[1],
            pupil_centers=t_in[2],
        )
        loss = t_crit(
            y_true=t_in[3], y_pred=out, mouse_id=mouse_id, batch_size=4
        )
        (loss + ref.regularizer(mouse_id=mouse_id)).backward()
        t_opt.step()
        with torch.no_grad():
            t_pred, _, _ = ref(
                t_val[0], mouse_id=mouse_id, behaviors=t_val[1],
                pupil_centers=t_val[2],
            )
        t_corr = float(
            np.mean(np_correlation(v_target, t_pred.numpy(), dim=0))
        )

        # jax step
        _, grads = j_grad(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), params, updates
        )
        j_corr = float(
            np.mean(np_correlation(v_target, np.asarray(j_predict(params)), dim=0))
        )
        assert abs(t_corr - j_corr) < 5e-4, (
            f"epoch {epoch}: monitored val corr diverged "
            f"(torch {t_corr:.6f} vs jax {j_corr:.6f})"
        )

        # BOTH schedulers driven by the torch value: identical decisions,
        # so any reduction/termination mismatch is a state-machine bug
        before_t, before_j = t_sched.num_reduce, j_sched.num_reduce
        t_term = t_sched.step(t_corr, epoch=epoch)
        j_term, params, opt_state = j_sched.step(
            t_corr, epoch=epoch, params=params, opt_state=opt_state
        )
        if t_sched.num_reduce > before_t:
            t_reductions.append(epoch)
        if j_sched.num_reduce > before_j:
            j_reductions.append(epoch)
        assert t_term == j_term, f"termination diverged at epoch {epoch}"
        if t_term:
            t_stop = j_stop = epoch
            break

    assert t_reductions, (
        "run never crossed a plateau rollback — the fixture/LR must be "
        "tuned so the scheduler path is exercised"
    )
    assert t_reductions == j_reductions
    assert t_sched.best_epoch == j_sched.best_epoch
    # LR decay applied identically (0.3^num_reduce on both groups)
    j_lrs = vopt.get_learning_rates(opt_state)
    np.testing.assert_allclose(j_lrs["core"], t_opt.param_groups[0]["lr"],
                               rtol=1e-6)
    np.testing.assert_allclose(j_lrs["rest"], t_opt.param_groups[-1]["lr"],
                               rtol=1e-6)

    # leaf-for-leaf parity at the end of the run (post-rollback + decayed-LR
    # steps). Rollbacks RESET accumulated fp drift to the saved checkpoint,
    # so the effective divergence horizon is the steps since the last
    # restore; tolerances sized like the 3-step test's argument scaled by
    # the longer horizon.
    t_params = convert_state_dict(ref.state_dict(), cfg)
    flat_t = jax.tree_util.tree_flatten_with_path(t_params)[0]
    flat_j = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    for path, t_leaf in flat_t:
        np.testing.assert_allclose(
            np.asarray(flat_j[path]), np.asarray(t_leaf),
            rtol=5e-3, atol=1e-3,
            err_msg=f"params diverged after {t_stop or max_epochs} epochs "
                    f"at {jax.tree_util.keystr(path)}",
        )
