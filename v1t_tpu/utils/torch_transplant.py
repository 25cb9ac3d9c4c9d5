"""Transplant reference (PyTorch) V1T weights into the JAX parameter tree.

This is the canonical torch<->JAX parameter mapping. It serves two purposes:

1. **Cross-framework parity validation** (tests/test_reference_parity.py):
   the reference implementation at /root/reference/src/v1t is constructed
   directly, its ``state_dict()`` is transplanted here, and end-to-end
   forward/gradient equality is asserted — the strongest available proxy for
   the ~0.29 single-trial-correlation target while the real archives are
   unavailable (BASELINE.md).
2. **Checkpoint import**: the published V1T checkpoints
   (huggingface bryanlimy/V1T, torch ``model_state.pt``) can be converted to
   this framework's parameter tree via ``convert_state_dict``.

Key conventions (torch -> flax):
- ``nn.Linear.weight`` is (out, in) and computes x @ W^T; flax ``Dense``
  kernels are (in, out) — every linear transposes.
- ``nn.Conv2d.weight`` is (out, in, kh, kw); flax ``nn.Conv`` kernels are
  (kh, kw, in, out).
- torch Sequential children are addressed by integer index (e.g. the
  reference ImageShifter's ``mlp.0 / mlp.2 / mlp.4``,
  src/v1t/models/image_cropper.py:26-36).

Reference module structure citations are given per mapping function.
"""

from __future__ import annotations

import typing as t

import numpy as np


def _np(x) -> np.ndarray:
    """torch tensor (or array) -> float32 numpy, always a fresh copy.

    ``detach().cpu().numpy()`` aliases the torch parameter storage, and
    ``np.asarray`` is a no-op for float32 inputs — without the explicit copy
    a later in-place torch mutation (e.g. ``optimizer.step()``) would
    silently rewrite the "transplanted" JAX initialization."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.array(x, np.float32, copy=True)


def _linear(sd: dict, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: dict, prefix: str) -> dict:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _conv(sd: dict, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _mlp3(sd: dict, prefix: str) -> dict:
    """Linear/Tanh x3 Sequential (reference ImageShifter/CoreShifter mlp:
    indices 0, 2, 4) -> {fc0, fc1, fc2}."""
    return {
        "fc0": _linear(sd, f"{prefix}.0"),
        "fc1": _linear(sd, f"{prefix}.2"),
        "fc2": _linear(sd, f"{prefix}.4"),
    }


# --- core: vit -------------------------------------------------------------------


def _vit_patch_embedding(sd: dict, patch_mode: int) -> dict:
    """reference src/v1t/models/core/vit.py:41-129 (Image2Patches.projection
    Sequential layout per patch_mode)."""
    p = "core.patch_embedding"
    out = {
        "cls_token": _np(sd[f"{p}.cls_token"]),
        "pos_embedding": _np(sd[f"{p}.pos_embedding"]),
    }
    if patch_mode == 0:  # Unfold(0), Rearrange(1), Linear(2)
        out["projection"] = _linear(sd, f"{p}.projection.2")
    elif patch_mode == 1:  # Conv2d(0), Rearrange(1)
        out["projection"] = _conv(sd, f"{p}.projection.0")
    elif patch_mode == 2:  # Shift(0), Unfold(1), Rearr(2), LN(3), Linear(4)
        out["patch_norm"] = _layernorm(sd, f"{p}.projection.3")
        out["projection"] = _linear(sd, f"{p}.projection.4")
    elif patch_mode == 3:  # Unfold(0), Rearr(1), LN(2), Linear(3), LN(4)
        out["pre_norm"] = _layernorm(sd, f"{p}.projection.2")
        out["projection"] = _linear(sd, f"{p}.projection.3")
        out["post_norm"] = _layernorm(sd, f"{p}.projection.4")
    else:
        raise NotImplementedError(f"patch_mode {patch_mode}")
    return out


def _vit_transformer(
    sd: dict,
    num_blocks: int,
    behavior_mode: int,
    mouse_ids: t.Sequence[str],
    use_lsa: bool,
    use_bias: bool,
) -> dict:
    """reference vit.py:287-362 (blocks of {mha, mlp, b-mlp}) -> our
    transformer param tree (block{i}_mha / block{i}_mlp / block{i}_bmlp)."""
    out = {}
    for i in range(num_blocks):
        bp = f"core.transformer.blocks.{i}"
        mha = {
            "ln_scale": _np(sd[f"{bp}.mha.layer_norm.weight"]),
            "ln_bias": _np(sd[f"{bp}.mha.layer_norm.bias"]),
            "to_qkv_kernel": _np(sd[f"{bp}.mha.to_qkv.weight"]).T,
            "projection_kernel": _np(sd[f"{bp}.mha.projection.0.weight"]).T,
        }
        if use_bias:
            mha["projection_bias"] = _np(sd[f"{bp}.mha.projection.0.bias"])
        if use_lsa:
            mha["scale"] = _np(sd[f"{bp}.mha.scale"])
        out[f"block{i}_mha"] = mha

        # MLP Sequential: LN(0), Linear(1), GELU(2), Drop(3), Linear(4),
        # Drop(5) (reference vit.py:144-151)
        mlp = {
            "ln_scale": _np(sd[f"{bp}.mlp.model.0.weight"]),
            "ln_bias": _np(sd[f"{bp}.mlp.model.0.bias"]),
            "fc1_kernel": _np(sd[f"{bp}.mlp.model.1.weight"]).T,
            "fc2_kernel": _np(sd[f"{bp}.mlp.model.4.weight"]).T,
        }
        if use_bias:
            mlp["fc1_bias"] = _np(sd[f"{bp}.mlp.model.1.bias"])
            mlp["fc2_bias"] = _np(sd[f"{bp}.mlp.model.4.bias"])
        out[f"block{i}_mlp"] = mlp

        if behavior_mode in (2, 3, 4):
            # BehaviorMLP Sequential: Linear(0), Tanh(1), Drop(2), Linear(3),
            # Tanh(4) (reference vit.py:196-213)
            names = list(mouse_ids) if behavior_mode == 4 else ["share"]
            bmlp = {}
            for name in names:
                mp = f"{bp}.b-mlp.models.{name}"
                bmlp[f"{name}_fc1"] = _linear(sd, f"{mp}.0", bias=use_bias)
                bmlp[f"{name}_fc2"] = _linear(sd, f"{mp}.3", bias=use_bias)
            out[f"block{i}_bmlp"] = bmlp
    return out


def _convert_vit_core(sd: dict, cfg) -> dict:
    return {
        "patch_embedding": _vit_patch_embedding(sd, cfg.patch_mode),
        "transformer": _vit_transformer(
            sd,
            num_blocks=cfg.num_blocks,
            behavior_mode=cfg.behavior_mode,
            mouse_ids=cfg.mouse_ids,
            use_lsa=cfg.use_lsa,
            use_bias=not cfg.disable_bias,
        ),
    }


# --- core: cct -------------------------------------------------------------------


def _convert_cct_core(sd: dict, cfg) -> dict:
    """reference src/v1t/models/core/cct.py — Tokenizer conv (bias-free),
    blocks of {mha(layer_norm, qkv, projection Sequential), mlp Sequential
    LN(0)/Linear(1)/GELU/Drop/Linear(4)/Drop, b_mlp}."""
    tokenizer: dict = {"conv2d": _conv(sd, "core.tokenizer.conv2d", bias=False)}
    if f"core.tokenizer.pos_embedding" in sd and cfg.pos_emb == "learn":
        tokenizer["pos_embedding"] = _np(sd["core.tokenizer.pos_embedding"])
    out = {"tokenizer": tokenizer}
    for i in range(cfg.num_blocks):
        bp = f"core.transformer.blocks.{i}"
        block = {
            "mha": {
                "layer_norm": _layernorm(sd, f"{bp}.mha.layer_norm"),
                "qkv": _linear(sd, f"{bp}.mha.qkv", bias=False),
                "projection": _linear(sd, f"{bp}.mha.projection.0"),
            },
            "mlp": {
                "ln_scale": _np(sd[f"{bp}.mlp.0.weight"]),
                "ln_bias": _np(sd[f"{bp}.mlp.0.bias"]),
                "fc1_kernel": _np(sd[f"{bp}.mlp.1.weight"]).T,
                "fc1_bias": _np(sd[f"{bp}.mlp.1.bias"]),
                "fc2_kernel": _np(sd[f"{bp}.mlp.4.weight"]).T,
                "fc2_bias": _np(sd[f"{bp}.mlp.4.bias"]),
            },
        }
        if cfg.behavior_mode in (1, 2, 3, 4):
            names = list(cfg.mouse_ids) if cfg.behavior_mode == 4 else ["share"]
            bmlp = {}
            for name in names:
                mp = f"{bp}.b_mlp.models.{name}"
                bmlp[f"{name}_fc1"] = _linear(sd, f"{mp}.0")
                bmlp[f"{name}_fc2"] = _linear(sd, f"{mp}.3")
            block["b_mlp"] = bmlp
        out[f"block{i}"] = block
    return out


# --- core: stacked2d -------------------------------------------------------------


def _convert_stacked2d_core(sd: dict, cfg) -> dict:
    """reference stacked2d.py:483-522 — features.layer{l} Sequentials with
    conv/ds_conv/attention_conv + norm/bias/scale layers."""
    conv_type = getattr(cfg, "stacked2d_conv_type", "ds")
    batch_norm = bool(getattr(cfg, "stacked2d_batch_norm", 1))
    independent = bool(getattr(cfg, "stacked2d_independent_bn_bias", 1))
    out: dict = {}
    l0 = "core.features.layer0.conv"
    out["layer0_conv"] = _conv(sd, l0, bias=f"{l0}.bias" in sd)
    for l in range(1, cfg.num_layers):
        lp = f"core.features.layer{l}"
        if conv_type == "ds":
            out[f"layer{l}_ds_conv"] = {
                "in_depth_conv": _conv(sd, f"{lp}.ds_conv.in_depth_conv"),
                "spatial_conv": _conv(sd, f"{lp}.ds_conv.spatial_conv"),
                "out_depth_conv": _conv(sd, f"{lp}.ds_conv.out_depth_conv"),
            }
        elif conv_type == "attention":
            ap = f"{lp}.attention_conv"
            out[f"layer{l}_attention_conv"] = {
                "query_conv": _conv(sd, f"{ap}.query_conv"),
                "key_conv": _conv(sd, f"{ap}.key_conv"),
                "value_conv": _conv(sd, f"{ap}.value_conv"),
                "rel_h": _np(sd[f"{ap}.rel_h"]),
                "rel_w": _np(sd[f"{ap}.rel_w"]),
            }
        else:
            out[f"layer{l}_conv"] = _conv(sd, f"{lp}.conv")
    if batch_norm:
        for l in range(cfg.num_layers):
            np_ = f"core.features.layer{l}.norm"
            if f"{np_}.weight" in sd:  # affine BN (weight+bias)
                out[f"layer{l}_norm"] = _layernorm(sd, np_)
            bp_ = f"core.features.layer{l}.bias"
            if f"{bp_}.bias" in sd:  # Bias2DLayer (1, C, 1, 1)
                out[f"layer{l}_bias2d"] = _np(sd[f"{bp_}.bias"]).reshape(-1)
            sp_ = f"core.features.layer{l}.scale"
            if f"{sp_}.scale" in sd:  # Scale2DLayer
                out[f"layer{l}_scale2d"] = _np(sd[f"{sp_}.scale"]).reshape(-1)
        del independent  # variant selection is implied by the present keys
    return out


# --- core: stn -------------------------------------------------------------------


def _convert_stn_core(sd: dict, cfg) -> dict:
    """reference stn.py:34-114 — localization Sequential (conv 0/3),
    regressor Sequential (Linear 1/3), cnn.block{i} conv+batchnorm."""
    out = {
        "loc_conv1": _conv(sd, "core.localization.0"),
        "loc_conv2": _conv(sd, "core.localization.3"),
        "reg_fc1": _linear(sd, "core.regressor.1"),
        "reg_fc2": _linear(sd, "core.regressor.3"),
    }
    for i in range(1, cfg.num_layers + 1):
        bp = f"core.cnn.block{i}"
        out[f"block{i}_conv"] = _conv(sd, f"{bp}.conv")
        out[f"block{i}_bn"] = _layernorm(sd, f"{bp}.batchnorm")
    return out


def convert_batch_stats(sd: dict, cfg) -> dict:
    """BatchNorm running statistics (torch ``running_mean``/``running_var``
    buffers) -> the flax ``batch_stats`` collection for the stateful cores."""
    core: dict = {}
    if cfg.core == "stacked2d":
        for l in range(cfg.num_layers):
            p = f"core.features.layer{l}.norm"
            if f"{p}.running_mean" in sd:
                core[f"layer{l}_norm"] = {
                    "mean": _np(sd[f"{p}.running_mean"]),
                    "var": _np(sd[f"{p}.running_var"]),
                }
    elif cfg.core == "stn":
        for i in range(1, cfg.num_layers + 1):
            p = f"core.cnn.block{i}.batchnorm"
            core[f"block{i}_bn"] = {
                "mean": _np(sd[f"{p}.running_mean"]),
                "var": _np(sd[f"{p}.running_var"]),
            }
    return {"batch_stats": {"core": core}} if core else {}


# --- readouts --------------------------------------------------------------------


def _convert_gaussian2d(sd: dict, mouse_id: str, use_grid_predictor: bool,
                        use_bias: bool = True) -> dict:
    """reference src/v1t/models/readout/gaussian2d.py — sigma/features keep
    their torch shapes; mu comes from either the free ``_mu`` parameter or
    the mu_transform Sequential (Linear(0), ELU(1), Linear(2), Tanh(3))."""
    p = f"readouts.{mouse_id}"
    out = {
        "sigma": _np(sd[f"{p}.sigma"]),
        "features": _np(sd[f"{p}.features"]),
    }
    if use_bias:
        out["bias"] = _np(sd[f"{p}.bias"])
    if use_grid_predictor:
        out["mu_fc1"] = _linear(sd, f"{p}.mu_transform.0")
        out["mu_fc2"] = _linear(sd, f"{p}.mu_transform.2")
    else:
        out["_mu"] = _np(sd[f"{p}._mu"])
    return out


def _convert_dense_readout(sd: dict, mouse_id: str) -> dict:
    """reference dense.py: Sequential Flatten(0), Linear(1), GELU(2),
    Dropout(3), Linear(4)."""
    p = f"readouts.{mouse_id}.dense"
    return {"fc1": _linear(sd, f"{p}.1"), "fc2": _linear(sd, f"{p}.4")}


def _convert_linear_readout(sd: dict, mouse_id: str) -> dict:
    """reference linear.py: Sequential Flatten(0), Linear(1)."""
    return {"linear": _linear(sd, f"readouts.{mouse_id}.linear.1")}


# --- full model ------------------------------------------------------------------

_CORE_CONVERTERS = {
    "vit": _convert_vit_core,
    "cct": _convert_cct_core,
    "stacked2d": _convert_stacked2d_core,
    "stn": _convert_stn_core,
}

_READOUT_CONVERTERS = {
    "gaussian2d": _convert_gaussian2d,
    "dense": lambda sd, m, **kw: _convert_dense_readout(sd, m),
    "linear": lambda sd, m, **kw: _convert_linear_readout(sd, m),
}


def register_core_converter(name: str, fn) -> None:
    _CORE_CONVERTERS[name] = fn


def convert_state_dict(sd: dict, cfg) -> dict:
    """Convert a reference ``Model.state_dict()`` into this framework's
    parameter tree.

    ``cfg`` needs: core, readout, shift_mode, behavior_mode, patch_mode,
    num_blocks, use_lsa, disable_bias, disable_grid_predictor, mouse_ids —
    i.e. a ``v1t_tpu.configs.Config`` (with mouse_ids resolved) works.
    """
    params: dict = {}

    # per-mouse image shifters (reference image_cropper.py:78-92, Sequential
    # mlp indices 0/2/4)
    if cfg.shift_mode in (1, 3, 4):
        params["image_cropper"] = {
            f"image_shifter_{m}": _mlp3(sd, f"image_cropper.image_shifter.{m}.mlp")
            for m in cfg.mouse_ids
        }

    if cfg.core not in _CORE_CONVERTERS:
        raise NotImplementedError(
            f"no torch transplant mapping for core {cfg.core!r}"
        )
    params["core"] = _CORE_CONVERTERS[cfg.core](sd, cfg)

    # per-mouse core shifters (reference core_shifter.py:43-63)
    if cfg.shift_mode in (2, 3, 4):
        params["core_shifter"] = {
            f"shifter_{m}": _mlp3(sd, f"core_shifter.{m}.mlp")
            for m in cfg.mouse_ids
        }

    if cfg.readout not in _READOUT_CONVERTERS:
        raise NotImplementedError(
            f"no torch transplant mapping for readout {cfg.readout!r}"
        )
    params["readouts"] = {
        f"readout_{m}": _READOUT_CONVERTERS[cfg.readout](
            sd, m, use_grid_predictor=not cfg.disable_grid_predictor
        )
        for m in cfg.mouse_ids
    }
    return params


def assert_tree_shapes_match(converted: dict, initialized: dict, path=""):
    """Structural check: the transplanted tree must cover exactly the
    initialized parameter tree with matching shapes — catches silent mapping
    drift before any numeric comparison."""
    ck, ik = set(converted.keys()), set(initialized.keys())
    assert ck == ik, (
        f"param tree mismatch at {path or '<root>'}: "
        f"only-converted={sorted(ck - ik)}, only-initialized={sorted(ik - ck)}"
    )
    for k in ik:
        c, i = converted[k], initialized[k]
        if isinstance(i, dict):
            assert isinstance(c, dict), f"{path}/{k}: expected subtree"
            assert_tree_shapes_match(c, i, f"{path}/{k}")
        else:
            assert np.shape(c) == np.shape(i), (
                f"{path}/{k}: shape {np.shape(c)} != {np.shape(i)}"
            )
