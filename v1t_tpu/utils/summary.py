"""Model summary files — the run-directory contract of the reference's
torchinfo summaries (reference src/v1t/models/model.py:19-47, 211-224):
``model.txt`` (full composition), ``model_core.txt`` and
``model_readout.txt`` (first mouse) are written at build time, and the
trainable-parameter count goes to the TensorBoard summary.

flax ``nn.tabulate`` plays torchinfo's role — it abstractly evaluates the
module (no device compute) and renders a per-submodule table of
input/output shapes and parameter counts.
"""

from __future__ import annotations

import os
import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn


def _render(module, args: tuple, method=None, **call_kwargs) -> str:
    rngs = {
        "params": jax.random.key(0),
        "dropout": jax.random.key(1),
        "droppath": jax.random.key(2),
        "sample": jax.random.key(3),
    }
    tab = nn.tabulate(
        module,
        rngs,
        method=method,
        depth=3,
        console_kwargs={"force_terminal": False, "width": 140},
    )
    return tab(*args, **call_kwargs)


def write_model_summaries(config, model, card, output_dir: str) -> None:
    """Write model.txt / model_core.txt / model_readout.txt into
    ``output_dir``. Failures are non-fatal (summaries must never break a
    training run)."""
    from v1t_tpu.models.cropper import ImageCropper
    from v1t_tpu.models.model import Model
    from v1t_tpu.models.registry import get_core, get_readout

    c, h, w = card.input_shape
    mouse_id = card.mouse_ids[0]
    zeros = jnp.zeros

    def _write(filename: str, text: str):
        with open(os.path.join(output_dir, filename), "w") as f:
            f.write(text)

    try:
        text = _render(
            model,
            (zeros((1, c, h, w)), zeros((1, 3)), zeros((1, 2))),
            method=Model.warmup,
        )
        _write("model.txt", text)
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"model.txt summary failed: {e}")

    dtype = jnp.bfloat16 if config.precision == "bf16" else None
    cropper = ImageCropper(
        input_shape=card.input_shape,
        mouse_ids=card.mouse_ids,
        shift_mode=config.shift_mode,
        behavior_mode=config.behavior_mode,
        center_crop=config.center_crop,
        resize_image=config.resize_image,
        ds_name=card.ds_name,
    )
    core = get_core(config.core).from_config(
        config, image_shape=cropper.output_shape, mouse_ids=card.mouse_ids,
        dtype=dtype,
    )
    try:
        cc, ch, cw = cropper.output_shape
        text = _render(
            core,
            (zeros((1, cc, ch, cw)),),
            mouse_id=mouse_id,
            behaviors=zeros((1, 3)),
            pupil_centers=zeros((1, 2)),
        )
        _write("model_core.txt", text)
    except Exception as e:  # pragma: no cover
        print(f"model_core.txt summary failed: {e}")

    try:
        readout_cls = get_readout(config.readout)
        kwargs: t.Dict[str, t.Any] = dict(
            input_shape=core.output_shape,
            neuron_card=card.neuron_cards[mouse_id],
            dtype=dtype,
        )
        if config.readout == "gaussian2d":
            kwargs.update(
                use_grid_predictor=not config.disable_grid_predictor,
                grid_predictor_dim=config.grid_predictor_dim,
                bias_mode=config.bias_mode,
            )
        oc, oh, ow = core.output_shape
        text = _render(readout_cls(**kwargs), (zeros((1, oc, oh, ow)),))
        _write("model_readout.txt", text)
    except Exception as e:  # pragma: no cover
        print(f"model_readout.txt summary failed: {e}")
