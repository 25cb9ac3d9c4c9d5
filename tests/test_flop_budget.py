"""Pin bench.py's vs_baseline denominator derivation to the model's actual
HLO-counted FLOPs (VERDICT r4 #7).

The A100 denominator (~1000 img/s) is derived from a bottom-up FLOP budget
(BENCH_NOTES "vs_baseline denominator: bottom-up A100 budget"): forward
~34.3 GFLOP/image and fwd+bwd ~103-105 GFLOP/image at the flagship shape
(emb 155, 4 blocks, 4 heads, mlp 488, patch 8 / stride 1 -> 1654 tokens,
gaussian2d over 7k neurons — reference train.py:542-590). If a kernel or
model change drifts the true FLOP count, this test fails and the documented
budget (and with it every vs_baseline claim) must be re-derived.

XLA's cost analysis counts a dot as 2*MACs, matching the hand budget's x2
convention; the composed (non-Pallas) path is used on CPU so every matmul
is visible to the analysis.
"""

import jax
import jax.numpy as jnp
import numpy as np

from v1t_tpu.configs import Config
from v1t_tpu.data.cards import synthetic_data_card
from v1t_tpu.losses import get_criterion
from v1t_tpu.models import build_model, model_regularizer
from v1t_tpu.models.model import init_model

# documented budget (BENCH_NOTES round 3, re-verified round 5)
FWD_GFLOP_PER_IMAGE = 34.3
STEP_GFLOP_PER_IMAGE = 103.0
TOLERANCE = 0.05  # 5% drift fails the documented derivation


def _flagship(batch_size=1):
    config = Config(
        core="vit", readout="gaussian2d", behavior_mode=3, shift_mode=2,
        batch_size=batch_size, precision="fp32", attention_impl="auto",
        resize_image=0, core_reg_scale=0.5379, readout_reg_scale=0.0076,
        lr=0.001647,
    )
    card = synthetic_data_card(
        mouse_ids=("A",), num_neurons=7000, input_shape=(1, 36, 64),
        ds_size=4096,
    )
    model = build_model(config, card)
    params = init_model(model, seed=0, batch_size=1)
    rng = np.random.default_rng(0)
    data = (
        jnp.asarray(rng.normal(size=(batch_size, 1, 36, 64)), jnp.float32),
        jnp.asarray(rng.normal(size=(batch_size, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(batch_size, 2)), jnp.float32),
        jnp.asarray(rng.poisson(2.0, size=(batch_size, 7000)), jnp.float32),
    )
    return config, card, model, params, data


def test_flagship_flop_budget_matches_documented():
    config, card, model, params, data = _flagship()
    images, behaviors, pupils, responses = data
    criterion = get_criterion(config, card.ds_sizes)

    def fwd(p):
        y, _, _ = model.apply(
            {"params": p}, images, mouse_id="A", behaviors=behaviors,
            pupil_centers=pupils, train=False,
        )
        return y

    fwd_flops = jax.jit(fwd).lower(params).cost_analysis()["flops"]
    rel = abs(fwd_flops / 1e9 - FWD_GFLOP_PER_IMAGE) / FWD_GFLOP_PER_IMAGE
    assert rel < TOLERANCE, (
        f"forward {fwd_flops / 1e9:.2f} GFLOP/image vs documented "
        f"{FWD_GFLOP_PER_IMAGE} (drift {rel:.1%}) — re-derive the "
        "vs_baseline denominator in BENCH_NOTES.md"
    )

    def loss_fn(p, step_rng):
        rngs = {
            "dropout": jax.random.fold_in(step_rng, 0),
            "droppath": jax.random.fold_in(step_rng, 1),
            "sample": jax.random.fold_in(step_rng, 2),
        }
        y_pred, _, _ = model.apply(
            {"params": p}, images, mouse_id="A", behaviors=behaviors,
            pupil_centers=pupils, train=True, rngs=rngs,
        )
        loss = criterion(responses, y_pred, mouse_id="A", batch_size=1)
        return loss + model_regularizer(config, p, mouse_id="A")

    step_flops = (
        jax.jit(jax.grad(loss_fn))
        .lower(params, jax.random.key(0))
        .cost_analysis()["flops"]
    )
    rel = abs(step_flops / 1e9 - STEP_GFLOP_PER_IMAGE) / STEP_GFLOP_PER_IMAGE
    assert rel < TOLERANCE, (
        f"train step {step_flops / 1e9:.2f} GFLOP/image vs documented "
        f"{STEP_GFLOP_PER_IMAGE} (drift {rel:.1%}) — re-derive the "
        "vs_baseline denominator in BENCH_NOTES.md"
    )
