"""Pretrained-core injection: copy the ``core`` subtree from another run's
checkpoint into a fresh model, then freeze it (reference
src/v1t/models/utils.py:14-30, model.py:183-185)."""

from __future__ import annotations

import os

import jax

from v1t_tpu.utils.scheduler import CKPT_NAME, load_checkpoint_file


def load_pretrain_core(config, params: dict) -> dict:
    filename = os.path.join(config.pretrain_core, "ckpt", CKPT_NAME)
    assert os.path.exists(filename), f"Cannot find pretrain core {filename}."
    ckpt = load_checkpoint_file(filename)
    core = ckpt["model"].get("core")
    assert core is not None, f"checkpoint {filename} has no core parameters."
    # the pretrained core must cover the model's core exactly
    expected = jax.tree_util.tree_structure(params["core"])
    got = jax.tree_util.tree_structure(core)
    assert expected == got, (
        f"pretrained core structure mismatch:\n{expected}\nvs\n{got}"
    )
    new_params = dict(params)
    new_params["core"] = jax.tree_util.tree_map(lambda x: x, core)
    if getattr(config, "verbose", 1):
        print(
            f"\nLoaded pretrained core from {config.pretrain_core} "
            f"(value: {float(ckpt['value']):.04f})."
        )
    return new_params
