"""Export this framework's parameters as a reference (PyTorch) state_dict.

The exact inverse of ``v1t_tpu.utils.torch_transplant.convert_state_dict``:
given a trained JAX parameter tree (+ optional ``batch_stats``), produce the
``Model.state_dict()`` key/value layout of the reference implementation
(/root/reference/src/v1t/models/model.py:50-177), so a model trained here
can be loaded by the reference's ``Scheduler.restore`` (partial
``state_dict.update``, reference utils/scheduler.py:122-136) and driven by
its own submission/demo tooling — bidirectional interop with
``import_checkpoint.py``.

Every mapping mirrors a function in torch_transplant.py; the round-trip
``convert_state_dict(export_state_dict(params)) == params`` is pinned
leaf-for-leaf by tests/test_checkpoint_export.py.
"""

from __future__ import annotations

import typing as t

import numpy as np


def _np(x) -> np.ndarray:
    # always a fresh, writable copy: msgpack-restored arrays are read-only
    # and torch.from_numpy warns on (and aliases) non-writable buffers
    return np.array(x, dtype=np.float32, copy=True)


def _linear(params: dict, prefix: str, out: dict) -> None:
    out[f"{prefix}.weight"] = _np(params["kernel"]).T
    if "bias" in params:
        out[f"{prefix}.bias"] = _np(params["bias"])


def _layernorm(params: dict, prefix: str, out: dict) -> None:
    out[f"{prefix}.weight"] = _np(params["scale"])
    out[f"{prefix}.bias"] = _np(params["bias"])


def _conv(params: dict, prefix: str, out: dict) -> None:
    # flax (kh, kw, in, out) -> torch (out, in, kh, kw)
    out[f"{prefix}.weight"] = _np(params["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in params:
        out[f"{prefix}.bias"] = _np(params["bias"])


def _mlp3(params: dict, prefix: str, out: dict) -> None:
    _linear(params["fc0"], f"{prefix}.0", out)
    _linear(params["fc1"], f"{prefix}.2", out)
    _linear(params["fc2"], f"{prefix}.4", out)


# --- core: vit -------------------------------------------------------------------


def _export_vit_core(core: dict, cfg, out: dict) -> None:
    pe = core["patch_embedding"]
    p = "core.patch_embedding"
    out[f"{p}.cls_token"] = _np(pe["cls_token"])
    out[f"{p}.pos_embedding"] = _np(pe["pos_embedding"])
    if cfg.patch_mode == 0:
        _linear(pe["projection"], f"{p}.projection.2", out)
    elif cfg.patch_mode == 1:
        _conv(pe["projection"], f"{p}.projection.0", out)
    elif cfg.patch_mode == 2:
        _layernorm(pe["patch_norm"], f"{p}.projection.3", out)
        _linear(pe["projection"], f"{p}.projection.4", out)
    elif cfg.patch_mode == 3:
        _layernorm(pe["pre_norm"], f"{p}.projection.2", out)
        _linear(pe["projection"], f"{p}.projection.3", out)
        _layernorm(pe["post_norm"], f"{p}.projection.4", out)
    else:
        raise NotImplementedError(f"patch_mode {cfg.patch_mode}")

    tr = core["transformer"]
    for i in range(cfg.num_blocks):
        bp = f"core.transformer.blocks.{i}"
        mha = tr[f"block{i}_mha"]
        out[f"{bp}.mha.layer_norm.weight"] = _np(mha["ln_scale"])
        out[f"{bp}.mha.layer_norm.bias"] = _np(mha["ln_bias"])
        out[f"{bp}.mha.to_qkv.weight"] = _np(mha["to_qkv_kernel"]).T
        out[f"{bp}.mha.projection.0.weight"] = _np(
            mha["projection_kernel"]
        ).T
        if "projection_bias" in mha:
            out[f"{bp}.mha.projection.0.bias"] = _np(mha["projection_bias"])
        if cfg.use_lsa:
            out[f"{bp}.mha.scale"] = _np(mha["scale"])

        mlp = tr[f"block{i}_mlp"]
        out[f"{bp}.mlp.model.0.weight"] = _np(mlp["ln_scale"])
        out[f"{bp}.mlp.model.0.bias"] = _np(mlp["ln_bias"])
        out[f"{bp}.mlp.model.1.weight"] = _np(mlp["fc1_kernel"]).T
        out[f"{bp}.mlp.model.4.weight"] = _np(mlp["fc2_kernel"]).T
        if "fc1_bias" in mlp:
            out[f"{bp}.mlp.model.1.bias"] = _np(mlp["fc1_bias"])
            out[f"{bp}.mlp.model.4.bias"] = _np(mlp["fc2_bias"])

        if cfg.behavior_mode in (2, 3, 4):
            bmlp = tr[f"block{i}_bmlp"]
            names = (
                list(cfg.mouse_ids) if cfg.behavior_mode == 4 else ["share"]
            )
            for name in names:
                mp = f"{bp}.b-mlp.models.{name}"
                _linear(bmlp[f"{name}_fc1"], f"{mp}.0", out)
                _linear(bmlp[f"{name}_fc2"], f"{mp}.3", out)


# --- core: cct -------------------------------------------------------------------


def _export_cct_core(core: dict, cfg, out: dict) -> None:
    _conv(core["tokenizer"]["conv2d"], "core.tokenizer.conv2d", out)
    if "pos_embedding" in core["tokenizer"]:
        out["core.tokenizer.pos_embedding"] = _np(
            core["tokenizer"]["pos_embedding"]
        )
    for i in range(cfg.num_blocks):
        bp = f"core.transformer.blocks.{i}"
        block = core[f"block{i}"]
        _layernorm(block["mha"]["layer_norm"], f"{bp}.mha.layer_norm", out)
        _linear(block["mha"]["qkv"], f"{bp}.mha.qkv", out)
        _linear(block["mha"]["projection"], f"{bp}.mha.projection.0", out)
        mlp = block["mlp"]
        out[f"{bp}.mlp.0.weight"] = _np(mlp["ln_scale"])
        out[f"{bp}.mlp.0.bias"] = _np(mlp["ln_bias"])
        out[f"{bp}.mlp.1.weight"] = _np(mlp["fc1_kernel"]).T
        out[f"{bp}.mlp.1.bias"] = _np(mlp["fc1_bias"])
        out[f"{bp}.mlp.4.weight"] = _np(mlp["fc2_kernel"]).T
        out[f"{bp}.mlp.4.bias"] = _np(mlp["fc2_bias"])
        if cfg.behavior_mode in (1, 2, 3, 4):
            names = (
                list(cfg.mouse_ids) if cfg.behavior_mode == 4 else ["share"]
            )
            for name in names:
                mp = f"{bp}.b_mlp.models.{name}"
                _linear(block["b_mlp"][f"{name}_fc1"], f"{mp}.0", out)
                _linear(block["b_mlp"][f"{name}_fc2"], f"{mp}.3", out)


# --- core: stacked2d -------------------------------------------------------------


def _export_stacked2d_core(core: dict, cfg, out: dict) -> None:
    conv_type = getattr(cfg, "stacked2d_conv_type", "ds")
    _conv(core["layer0_conv"], "core.features.layer0.conv", out)
    for l in range(1, cfg.num_layers):
        lp = f"core.features.layer{l}"
        if conv_type == "ds":
            ds = core[f"layer{l}_ds_conv"]
            _conv(ds["in_depth_conv"], f"{lp}.ds_conv.in_depth_conv", out)
            _conv(ds["spatial_conv"], f"{lp}.ds_conv.spatial_conv", out)
            _conv(ds["out_depth_conv"], f"{lp}.ds_conv.out_depth_conv", out)
        elif conv_type == "attention":
            ac = core[f"layer{l}_attention_conv"]
            ap = f"{lp}.attention_conv"
            _conv(ac["query_conv"], f"{ap}.query_conv", out)
            _conv(ac["key_conv"], f"{ap}.key_conv", out)
            _conv(ac["value_conv"], f"{ap}.value_conv", out)
            out[f"{ap}.rel_h"] = _np(ac["rel_h"])
            out[f"{ap}.rel_w"] = _np(ac["rel_w"])
        else:
            _conv(core[f"layer{l}_conv"], f"{lp}.conv", out)
    for l in range(cfg.num_layers):
        if f"layer{l}_norm" in core:
            _layernorm(core[f"layer{l}_norm"],
                       f"core.features.layer{l}.norm", out)
        if f"layer{l}_bias2d" in core:
            out[f"core.features.layer{l}.bias.bias"] = _np(
                core[f"layer{l}_bias2d"]
            ).reshape(1, -1, 1, 1)
        if f"layer{l}_scale2d" in core:
            out[f"core.features.layer{l}.scale.scale"] = _np(
                core[f"layer{l}_scale2d"]
            ).reshape(1, -1, 1, 1)


# --- core: stn -------------------------------------------------------------------


def _export_stn_core(core: dict, cfg, out: dict) -> None:
    _conv(core["loc_conv1"], "core.localization.0", out)
    _conv(core["loc_conv2"], "core.localization.3", out)
    _linear(core["reg_fc1"], "core.regressor.1", out)
    _linear(core["reg_fc2"], "core.regressor.3", out)
    for i in range(1, cfg.num_layers + 1):
        bp = f"core.cnn.block{i}"
        _conv(core[f"block{i}_conv"], f"{bp}.conv", out)
        _layernorm(core[f"block{i}_bn"], f"{bp}.batchnorm", out)


def export_batch_stats(batch_stats: dict, cfg, out: dict) -> None:
    """flax ``batch_stats`` collection -> torch running_mean/running_var
    buffers (inverse of torch_transplant.convert_batch_stats)."""
    core = batch_stats.get("core", {})
    if cfg.core == "stacked2d":
        for l in range(cfg.num_layers):
            if f"layer{l}_norm" in core:
                p = f"core.features.layer{l}.norm"
                out[f"{p}.running_mean"] = _np(core[f"layer{l}_norm"]["mean"])
                out[f"{p}.running_var"] = _np(core[f"layer{l}_norm"]["var"])
    elif cfg.core == "stn":
        for i in range(1, cfg.num_layers + 1):
            if f"block{i}_bn" in core:
                p = f"core.cnn.block{i}.batchnorm"
                out[f"{p}.running_mean"] = _np(core[f"block{i}_bn"]["mean"])
                out[f"{p}.running_var"] = _np(core[f"block{i}_bn"]["var"])


# --- readouts --------------------------------------------------------------------


def _export_gaussian2d(ro: dict, mouse_id: str, out: dict) -> None:
    p = f"readouts.{mouse_id}"
    out[f"{p}.sigma"] = _np(ro["sigma"])
    out[f"{p}.features"] = _np(ro["features"])
    if "bias" in ro:
        out[f"{p}.bias"] = _np(ro["bias"])
    if "_mu" in ro:
        out[f"{p}._mu"] = _np(ro["_mu"])
    else:
        _linear(ro["mu_fc1"], f"{p}.mu_transform.0", out)
        _linear(ro["mu_fc2"], f"{p}.mu_transform.2", out)


def _export_dense_readout(ro: dict, mouse_id: str, out: dict) -> None:
    p = f"readouts.{mouse_id}.dense"
    _linear(ro["fc1"], f"{p}.1", out)
    _linear(ro["fc2"], f"{p}.4", out)


def _export_linear_readout(ro: dict, mouse_id: str, out: dict) -> None:
    _linear(ro["linear"], f"readouts.{mouse_id}.linear.1", out)


_CORE_EXPORTERS = {
    "vit": _export_vit_core,
    "cct": _export_cct_core,
    "stacked2d": _export_stacked2d_core,
    "stn": _export_stn_core,
}

_READOUT_EXPORTERS = {
    "gaussian2d": _export_gaussian2d,
    "dense": _export_dense_readout,
    "linear": _export_linear_readout,
}


def export_state_dict(
    params: dict, cfg, batch_stats: t.Optional[dict] = None
) -> t.Dict[str, np.ndarray]:
    """Convert this framework's parameter tree into the reference
    ``Model.state_dict()`` layout (numpy values; wrap in torch tensors for
    ``torch.save``). ``cfg`` needs the same fields as
    torch_transplant.convert_state_dict."""
    out: t.Dict[str, np.ndarray] = {}

    if cfg.shift_mode in (1, 3, 4):
        for m in cfg.mouse_ids:
            _mlp3(
                params["image_cropper"][f"image_shifter_{m}"],
                f"image_cropper.image_shifter.{m}.mlp", out,
            )

    if cfg.core not in _CORE_EXPORTERS:
        raise NotImplementedError(f"no torch export for core {cfg.core!r}")
    _CORE_EXPORTERS[cfg.core](params["core"], cfg, out)

    if cfg.shift_mode in (2, 3, 4):
        for m in cfg.mouse_ids:
            _mlp3(
                params["core_shifter"][f"shifter_{m}"],
                f"core_shifter.{m}.mlp", out,
            )

    if cfg.readout not in _READOUT_EXPORTERS:
        raise NotImplementedError(
            f"no torch export for readout {cfg.readout!r}"
        )
    for m in cfg.mouse_ids:
        _READOUT_EXPORTERS[cfg.readout](
            params["readouts"][f"readout_{m}"], m, out
        )

    if batch_stats:
        # accept either the flax collection ({"core": ...}) or the
        # convert_batch_stats wrapper ({"batch_stats": {"core": ...}})
        export_batch_stats(
            batch_stats.get("batch_stats", batch_stats), cfg, out
        )
    return out
