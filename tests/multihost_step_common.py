"""Shared model/batch setup for the 2-process multihost training-step
test (tests/test_multihost.py): the SAME tiny flagship-family config and
the SAME deterministic global batch are built by the single-process oracle
and by each jax.distributed worker, so updated parameters can be compared
leaf-for-leaf. Not a test module (no ``test_`` prefix) — imported by the
worker script via sys.path.

Multihost contract exercised (SURVEY §5.8 DCN path): each process feeds
its HOST-LOCAL rows through the real ``Trainer`` (prepare_batch pads at
local granularity, ``shard_batch``/``shard_mask`` stitch via
``jax.make_array_from_process_local_data``); ds-scale and regularizer
weights use GLOBAL totals, and the optimizer update runs on gradients
all-reduced across both processes by GSPMD.
"""

import numpy as np

GLOBAL_BATCH = 8
NUM_NEURONS = 64


def make_config_card():
    from v1t_tpu.configs import Config
    from v1t_tpu.data.cards import synthetic_data_card

    config = Config(
        core="vit", readout="gaussian2d", behavior_mode=3, shift_mode=2,
        batch_size=GLOBAL_BATCH, num_blocks=2, emb_dim=16, num_heads=2,
        mlp_dim=32, patch_size=8, patch_stride=4, precision="fp32",
        attention_impl="xla", resize_image=0, t_dropout=0.0, p_dropout=0.0,
    )
    card = synthetic_data_card(
        mouse_ids=("A", "B"), num_neurons=NUM_NEURONS,
        input_shape=(1, 16, 24), ds_size=128,
    )
    return config, card


def make_global_batch():
    rng = np.random.default_rng(7)
    return {
        "image": rng.normal(size=(GLOBAL_BATCH, 1, 16, 24)).astype(
            np.float32
        ),
        "response": rng.poisson(
            2.0, size=(GLOBAL_BATCH, NUM_NEURONS)
        ).astype(np.float32),
        "behavior": rng.normal(size=(GLOBAL_BATCH, 3)).astype(np.float32),
        "pupil_center": rng.normal(size=(GLOBAL_BATCH, 2)).astype(
            np.float32
        ),
    }


def train_two_steps(mesh, batch):
    """Two accumulation steps (mice A then B) + one optimizer update
    through the real Trainer; returns the updated params."""
    import jax

    from v1t_tpu import training
    from v1t_tpu.models import build_model
    from v1t_tpu.models.model import init_model_variables

    config, card = make_config_card()
    model = build_model(config, card)
    params, state = init_model_variables(model, seed=0)
    trainer = training.Trainer(
        config, model, params, card, mesh=mesh, model_state=state
    )
    acc, _ = trainer.train_step("A", batch, acc_grads=None, update=False)
    acc, metrics = trainer.train_step("B", batch, acc_grads=acc, update=True)
    jax.block_until_ready(trainer.params)
    return trainer.params, metrics
