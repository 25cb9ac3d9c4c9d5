"""Ensemble of trained models with a learnable output head (reference
ensemble.py:31-151).

``EnsembleModel`` wraps >=1 saved Models (each restored from its own run
directory and frozen), runs them with ``activate=False``, stacks the raw
outputs on a trailing model axis, and combines them with an ``OutputModule``:
mode 0 average / 1 shared Linear / 2 per-mouse Linear over the model axis,
followed by ELU1 (reference ensemble.py:68-83). Only the output head trains
(optimizer freezes the rest; checkpoints save just ``output_module`` via the
scheduler's module_names filter, reference ensemble.py:327-334).
"""

from __future__ import annotations

import os
import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from v1t_tpu.configs import Config, load_args
from v1t_tpu.data.cards import DataCard
from v1t_tpu.models.cores.vit import trunc_normal_init
from v1t_tpu.models.model import Model, init_model_variables
from v1t_tpu.ops.common import elu1
from v1t_tpu.utils.scheduler import CKPT_NAME, load_checkpoint_file


class OutputModule(nn.Module):
    """ensemble_mode 0: average / 1: shared Linear / 2: per-mouse Linear."""

    ensemble_mode: int
    in_features: int
    mouse_ids: t.Tuple[str, ...]

    @nn.compact
    def __call__(self, inputs: jax.Array, mouse_id: str) -> jax.Array:
        assert self.ensemble_mode in (0, 1, 2)
        if self.ensemble_mode == 0:
            outputs = jnp.mean(inputs, axis=-1)
        else:
            name = "linear" if self.ensemble_mode == 1 else f"linear_{mouse_id}"
            outputs = nn.Dense(
                1,
                kernel_init=trunc_normal_init,
                bias_init=nn.initializers.zeros,
                name=name,
            )(inputs)
            outputs = jnp.squeeze(outputs, axis=-1)
        return elu1(outputs)


class EnsembleModel(nn.Module):
    """Sub-model configs are replayed from each run's args.yaml; parameters
    are injected after init via ``load_ensemble``."""

    model_configs: t.Tuple[t.Tuple[str, Config], ...]  # (name, config)
    data_card: DataCard
    ensemble_mode: int = 0

    def setup(self):
        self.models = {
            name: Model(
                config=cfg,
                data_card=self.data_card,
                dtype=jnp.bfloat16 if cfg.precision == "bf16" else None,
                name=f"ensemble_{name}",
            )
            for name, cfg in self.model_configs
        }
        self.output_module = OutputModule(
            ensemble_mode=self.ensemble_mode,
            in_features=len(self.model_configs),
            mouse_ids=self.data_card.mouse_ids,
            name="output_module",
        )

    def __call__(
        self,
        inputs: jax.Array,
        mouse_id: str,
        behaviors: jax.Array,
        pupil_centers: jax.Array,
        train: bool = False,
        activate: bool = True,
    ):
        outs = []
        for name, _ in self.model_configs:
            # sub-models always run in eval mode and un-activated
            # (reference ensemble.py:104, 138-148)
            out, _, _ = self.models[name](
                inputs,
                mouse_id=mouse_id,
                behaviors=behaviors,
                pupil_centers=pupil_centers,
                train=False,
                activate=False,
            )
            outs.append(out[..., None])
        stacked = jnp.concatenate(outs, axis=-1)  # (B, N, num_models)
        outputs = self.output_module(stacked, mouse_id=mouse_id)
        return outputs, None, None

    def warmup(self, inputs, behaviors, pupil_centers):
        out = []
        for mouse_id in self.data_card.mouse_ids:
            o, _, _ = self(
                inputs, mouse_id=mouse_id, behaviors=behaviors,
                pupil_centers=pupil_centers, train=False,
            )
            out.append(jnp.sum(o))
        return jnp.stack(out)


def ensemble_regularizer(params, mouse_id: str):
    """The ensemble has no regularizer (reference ensemble.py:128-129)."""
    return jnp.zeros(())


def build_ensemble(
    config: Config,
    saved_models: t.Dict[str, str],
    data_card: DataCard,
) -> t.Tuple[EnsembleModel, dict, dict]:
    """Construct the ensemble and inject each saved run's best parameters.
    Returns (model, params, model_state)."""
    model_configs = []
    for name, output_dir in saved_models.items():
        sub_cfg = load_args(output_dir)
        sub_cfg.precision = config.precision
        sub_cfg.attention_impl = config.attention_impl
        model_configs.append((name, sub_cfg))

    model = EnsembleModel(
        model_configs=tuple(model_configs),
        data_card=data_card,
        ensemble_mode=config.ensemble_mode,
    )
    params, model_state = init_model_variables(model, seed=config.seed)

    for name, output_dir in saved_models.items():
        filename = os.path.join(output_dir, "ckpt", CKPT_NAME)
        assert os.path.exists(filename), f"Cannot find {filename}."
        ckpt = load_checkpoint_file(filename)
        sub = dict(params[f"ensemble_{name}"])
        # partial update like the reference (ensemble.py:116-121)
        for key, value in ckpt["model"].items():
            sub[key] = value
        params[f"ensemble_{name}"] = sub
        if "model_state" in ckpt and f"ensemble_{name}" in model_state.get(
            "batch_stats", {}
        ):
            model_state["batch_stats"][f"ensemble_{name}"] = ckpt["model_state"][
                "batch_stats"
            ]
        if getattr(config, "verbose", 1):
            print(
                f"Loaded checkpoint from {output_dir} "
                f"(correlation: {float(ckpt['value']):.04f})."
            )
    return model, params, model_state
