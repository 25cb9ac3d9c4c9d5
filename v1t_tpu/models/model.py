"""Full model assembly: ImageCropper -> core -> CoreShifters -> per-mouse
readouts -> ELU1.

Parity with reference src/v1t/models/model.py:
- forward contract ``(outputs, images, image_grids)`` with ``activate=False``
  skipping the ELU1 (model.py:151-177, used by ensembles),
- shift_mode 0-4 decides which shifters exist (model.py:51-58, 81-93),
- ``model_regularizer`` sums core + readout(mouse) + cropper(mouse) +
  core_shifter(mouse) regularizers (model.py:141-149),
- per-module learning-rate groups are exposed through ``param_labels``
  (model.py:112-139 get_parameters; consumed by optax.multi_transform in the
  trainer).

Per-mouse heterogeneity under jit: ``mouse_id`` is a static Python string —
each mouse gets its own compiled train/eval step variant (7 mice x {train,
eval} stays cheap at these model sizes), matching the reference's
one-mouse-per-step schedule (reference train.py:101-114).
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from v1t_tpu.configs import Config
from v1t_tpu.data.cards import DataCard
from v1t_tpu.models.cropper import ImageCropper
from v1t_tpu.models.registry import get_core, get_readout
from v1t_tpu.models.shifter import CoreShifters
from v1t_tpu.ops.common import elu1


class Readouts(nn.Module):
    """One readout per mouse, dispatched on the static mouse_id (reference
    src/v1t/models/readout/readout.py:52-85)."""

    model: str
    input_shape: t.Tuple[int, int, int]
    data_card: DataCard
    use_grid_predictor: bool = True
    grid_predictor_dim: int = 2
    bias_mode: int = 0
    dtype: t.Any = None
    impl: str = "auto"

    def setup(self):
        cls = get_readout(self.model)
        readouts = {}
        for mouse_id in self.data_card.mouse_ids:
            kwargs = dict(
                input_shape=self.input_shape,
                neuron_card=self.data_card.neuron_cards[mouse_id],
                dtype=self.dtype,
                name=f"readout_{mouse_id}",
            )
            if self.model == "gaussian2d":
                kwargs.update(
                    use_grid_predictor=self.use_grid_predictor,
                    grid_predictor_dim=self.grid_predictor_dim,
                    bias_mode=self.bias_mode,
                    impl=self.impl,
                )
            readouts[mouse_id] = cls(**kwargs)
        self.readouts = readouts

    def __call__(self, inputs, mouse_id: str, shifts=None, train=False, sample=None):
        return self.readouts[mouse_id](
            inputs, shifts=shifts, train=train, sample=sample
        )


class Model(nn.Module):
    config: Config
    data_card: DataCard
    dtype: t.Any = None

    def setup(self):
        cfg = self.config
        card = self.data_card
        self.image_cropper = ImageCropper(
            input_shape=card.input_shape,
            mouse_ids=card.mouse_ids,
            shift_mode=cfg.shift_mode,
            behavior_mode=cfg.behavior_mode,
            center_crop=cfg.center_crop,
            resize_image=cfg.resize_image,
            ds_name=card.ds_name,
            dtype=self.dtype,
            name="image_cropper",
        )
        core_cls = get_core(cfg.core)
        self.core = core_cls.from_config(
            cfg,
            image_shape=self.image_cropper.output_shape,
            mouse_ids=card.mouse_ids,
            dtype=self.dtype,
        )
        if cfg.shift_mode in (2, 3, 4):
            self.core_shifter = CoreShifters(
                mouse_ids=card.mouse_ids,
                hidden_features=5,
                num_layers=3,
                dtype=self.dtype,
                name="core_shifter",
            )
        else:
            self.core_shifter = None
        self.readouts = Readouts(
            model=cfg.readout,
            input_shape=self.core.output_shape,
            data_card=card,
            use_grid_predictor=not cfg.disable_grid_predictor,
            grid_predictor_dim=cfg.grid_predictor_dim,
            bias_mode=cfg.bias_mode,
            dtype=self.dtype,
            impl=getattr(cfg, "readout_impl", "auto"),
            name="readouts",
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
        """Returns (responses (B, N), cropped images, image grids)."""
        images, image_grids = self.image_cropper(
            inputs, mouse_id=mouse_id, behaviors=behaviors,
            pupil_centers=pupil_centers,
        )
        outputs = self.core(
            images,
            mouse_id=mouse_id,
            behaviors=behaviors,
            pupil_centers=pupil_centers,
            train=train,
        )
        shifts = None
        if self.core_shifter is not None:
            shifts = self.core_shifter(pupil_centers, mouse_id=mouse_id)
        outputs = self.readouts(outputs, mouse_id=mouse_id, shifts=shifts, train=train)
        outputs = outputs.astype(jnp.float32)
        if activate:
            outputs = elu1(outputs)
        return outputs, images, image_grids

    def warmup(self, inputs, behaviors, pupil_centers):
        """Run every per-mouse path once so ``init`` creates all parameters
        (per-mouse readouts/shifters/BehaviorMLPs are lazily materialized)."""
        out = []
        for mouse_id in self.data_card.mouse_ids:
            o, _, _ = self(
                inputs,
                mouse_id=mouse_id,
                behaviors=behaviors,
                pupil_centers=pupil_centers,
                train=False,
            )
            out.append(jnp.sum(o))
        return jnp.stack(out)

    def crop(self, inputs, mouse_id: str, behaviors, pupil_centers):
        """Run only the image cropper (used by the attention-rollout driver,
        reference attention_rollout.py:168-173)."""
        return self.image_cropper(
            inputs, mouse_id=mouse_id, behaviors=behaviors,
            pupil_centers=pupil_centers,
        )

    def core_forward(
        self, images, mouse_id: str, behaviors, pupil_centers,
        train: bool = False, return_probs: bool = False,
    ):
        """Core-only forward on already-cropped images; can export attention
        probabilities for rollout (the Recorder-equivalent; reference
        src/v1t/utils/attention_rollout.py:136-201 runs the cropper manually
        then records the core)."""
        return self.core(
            images,
            mouse_id=mouse_id,
            behaviors=behaviors,
            pupil_centers=pupil_centers,
            train=train,
            return_probs=return_probs,
        )


def build_model(config: Config, data_card: DataCard) -> Model:
    dtype = jnp.bfloat16 if config.precision == "bf16" else None
    return Model(config=config, data_card=data_card, dtype=dtype)


def core_token_count(config: Config, data_card: DataCard) -> int:
    """Token count (patches + CLS) of the configured core WITHOUT binding a
    Model: submodules assigned in Model.setup() are not accessible on the
    unbound module (Flax restriction), so callers that need the token count
    before apply/init (e.g. train.py's sequence-parallel warning) rebuild
    the core dataclass directly — its ``num_patches`` property reads only
    dataclass fields."""
    cropper = ImageCropper(
        input_shape=data_card.input_shape,
        mouse_ids=data_card.mouse_ids,
        shift_mode=config.shift_mode,
        behavior_mode=config.behavior_mode,
        center_crop=config.center_crop,
        resize_image=config.resize_image,
        ds_name=data_card.ds_name,
    )
    core = get_core(config.core).from_config(
        config, image_shape=cropper.output_shape, mouse_ids=data_card.mouse_ids
    )
    return int(core.num_patches) + 1  # + CLS


def init_model_variables(
    model: Model, seed: int = 0, batch_size: int = 1
) -> t.Tuple[t.Dict[str, t.Any], t.Dict[str, t.Any]]:
    """Initialize ALL parameters (every mouse's branch) with one init call.
    Returns (params, model_state) where model_state holds the non-parameter
    collections (e.g. BatchNorm batch_stats for stacked2d/stn cores)."""
    card = model.data_card
    c, h, w = card.input_shape
    key = jax.random.key(seed)
    k_params, k_dropout, k_droppath, k_sample = jax.random.split(key, 4)
    variables = model.init(
        {
            "params": k_params,
            "dropout": k_dropout,
            "droppath": k_droppath,
            "sample": k_sample,
        },
        jnp.zeros((batch_size, c, h, w), jnp.float32),
        jnp.zeros((batch_size, 3), jnp.float32),
        jnp.zeros((batch_size, 2), jnp.float32),
        method=Model.warmup,
    )
    variables = dict(variables)
    params = variables.pop("params")
    return params, variables


def init_model(model: Model, seed: int = 0, batch_size: int = 1):
    """Parameters only — for models without stateful collections."""
    return init_model_variables(model, seed=seed, batch_size=batch_size)[0]


def model_regularizer(
    config: Config,
    params: t.Dict[str, t.Any],
    mouse_id: str,
    core_frozen: bool = False,
) -> jax.Array:
    """Sum of module regularizers for one mouse (reference model.py:141-149)."""
    core_cls = get_core(config.core)
    readout_cls = get_readout(config.readout)
    reg = jnp.zeros(())
    if not core_frozen:
        if config.core == "stacked2d":
            # stacked2d regularizes via gamma_input/gamma_hidden
            # (reference stacked2d.py:580-583)
            reg = reg + core_cls.regularizer(
                params["core"],
                reg_scale=config.core_reg_input,
                gamma_input=config.core_reg_input,
                gamma_hidden=config.core_reg_hidden,
            )
        else:
            reg = reg + core_cls.regularizer(params["core"], config.core_reg_scale)
    reg = reg + readout_cls.regularizer(
        params["readouts"][f"readout_{mouse_id}"], config.readout_reg_scale
    )
    if "image_cropper" in params:
        reg = reg + ImageCropper.regularizer(
            params["image_cropper"], mouse_id, config.cropper_reg_scale
        )
    if "core_shifter" in params:
        reg = reg + CoreShifters.regularizer(
            params["core_shifter"], mouse_id, config.shifter_reg_scale
        )
    return reg


def param_labels(params: t.Dict[str, t.Any]) -> t.Dict[str, t.Any]:
    """Label each top-level module for optax.multi_transform: the core trains
    at ``core_lr``, everything else at ``lr`` (reference model.py:112-139)."""
    return {
        top: jax.tree_util.tree_map(lambda _: "core" if top == "core" else "rest", sub)
        for top, sub in params.items()
    }
