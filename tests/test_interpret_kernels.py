"""Fused Pallas kernels on the virtual CPU mesh via the Mosaic interpreter.

V1T_PALLAS_INTERPRET=1 routes every pallas_call through
``pltpu.InterpretParams`` and flips the backend gates
(vit._fused_attention_eligible, the fused-MLP and interp-matmul dispatch),
so the SAME fused kernel path that runs on the chip executes on the
8-virtual-device CPU mesh. This closes the multi-device evidence gap for
the kernels themselves: the DP trained-step equality below runs the fused
attention/MLP/readout kernels inside ``kernel_sharding.call_kernel``'s
shard_map over a real (virtual) 8-device mesh — previously the kernels'
multi-device coverage was a 1-device real-chip mesh
(tests_tpu/test_dp_kernels_tpu.py) and the virtual-mesh evidence covered
only the XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v1t_tpu.configs import Config
from v1t_tpu.data.cards import synthetic_data_card
from v1t_tpu.models import build_model
from v1t_tpu.models.model import init_model_variables


def _tiny_config(**kw):
    base = dict(
        core="vit", readout="gaussian2d", behavior_mode=3, shift_mode=2,
        batch_size=16, num_blocks=2, emb_dim=16, num_heads=2, mlp_dim=32,
        patch_size=8, patch_stride=4, precision="bf16",
        attention_impl="auto", resize_image=0, t_dropout=0.0, p_dropout=0.0,
    )
    base.update(kw)
    return Config(**base)


def _batch(batch_size=16, neurons=64, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return {
        "image": rng.normal(size=(batch_size, 1, 16, 24)).astype(np.float32),
        "response": rng.poisson(
            2.0, size=(batch_size, neurons)
        ).astype(np.float32),
        "behavior": rng.normal(size=(batch_size, 3)).astype(np.float32),
        "pupil_center": rng.normal(size=(batch_size, 2)).astype(np.float32),
    }


def _forward(config, card, batch, train=False):
    model = build_model(config, card)
    params, state = init_model_variables(model, seed=0)
    out, _, _ = model.apply(
        {"params": params, **state},
        jnp.asarray(batch["image"]),
        mouse_id="A",
        behaviors=jnp.asarray(batch["behavior"]),
        pupil_centers=jnp.asarray(batch["pupil_center"]),
        train=train,
    )
    return np.asarray(out, np.float64)


def test_interpret_gate_rejects_garbage(monkeypatch):
    from v1t_tpu.ops.common import interpret_enabled

    monkeypatch.setenv("V1T_PALLAS_INTERPRET", "2")
    with pytest.raises(ValueError):
        interpret_enabled()


def test_fused_interpret_forward_matches_composed(monkeypatch):
    """The fused attention/MLP/readout kernels under the Mosaic interpreter
    reproduce the composed XLA path's forward on CPU (bf16 tolerance)."""
    card = synthetic_data_card(
        mouse_ids=("A",), num_neurons=64, input_shape=(1, 16, 24),
        ds_size=128,
    )
    batch = _batch()

    monkeypatch.delenv("V1T_PALLAS_INTERPRET", raising=False)
    composed = _forward(_tiny_config(attention_impl="xla"), card, batch)

    monkeypatch.setenv("V1T_PALLAS_INTERPRET", "1")
    from v1t_tpu.models.cores.vit import _fused_attention_eligible

    assert _fused_attention_eligible(jnp.bfloat16, "auto", 16)
    fused = _forward(_tiny_config(), card, batch)

    assert np.isfinite(fused).all()
    np.testing.assert_allclose(fused, composed, rtol=0, atol=5e-2)


@pytest.mark.slow
def test_dp_trained_step_equality_fused_interpret(monkeypatch):
    """DP trained-step equality ON THE FUSED KERNEL PATH over the 8-device
    virtual mesh: one optimizer update through the fused kernels inside
    shard_map must match the single-device fused update (dropout off so the
    per-shard kernel seed offsets are inert)."""
    from v1t_tpu import training
    from v1t_tpu.parallel.mesh import DataParallel

    monkeypatch.setenv("V1T_PALLAS_INTERPRET", "1")

    n_devices = min(8, len(jax.devices()))
    assert n_devices >= 2, "virtual mesh missing (conftest sets 8)"
    config = _tiny_config(batch_size=2 * n_devices)
    card = synthetic_data_card(
        mouse_ids=("A", "B"), num_neurons=64, input_shape=(1, 16, 24),
        ds_size=128,
    )
    batch = _batch(batch_size=2 * n_devices)

    def run(mesh):
        model = build_model(config, card)
        params, state = init_model_variables(model, seed=0)
        trainer = training.Trainer(
            config, model, params, card, mesh=mesh, model_state=state
        )
        acc, _ = trainer.train_step("A", batch, acc_grads=None, update=False)
        acc, metrics = trainer.train_step(
            "B", batch, acc_grads=acc, update=False
        )
        jax.block_until_ready(acc)
        assert np.isfinite(metrics["loss/total_loss"])
        return acc

    single = run(None)
    mesh = DataParallel.create(devices=jax.devices()[:n_devices])
    dp = run(mesh)

    # compare the cross-mouse ACCUMULATED GRADIENTS: the multi-device
    # property at stake is grad psum over the mesh == single-device batch
    # sum. (Post-Adam params are the wrong observable under bf16: a
    # reassociation-level grad difference on a near-zero entry flips the
    # first Adam update's sign, a 2*lr jump — the fp32 XLA equality pass in
    # dryrun_multichip covers the optimizer itself.)
    max_rel = 0.0
    for a, b in zip(
        jax.tree_util.tree_leaves(single), jax.tree_util.tree_leaves(dp)
    ):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        # leaf-scale-relative: bf16 products reassociate across the 8-way
        # psum, so near-zero entries carry noise proportional to the LEAF's
        # gradient scale, not their own magnitude
        scale = max(float(np.max(np.abs(a))), 1e-6)
        leaf_rel = float(np.max(np.abs(a - b))) / scale
        assert leaf_rel <= 3e-2, f"fused DP grad mismatch: {leaf_rel:.3e}"
        max_rel = max(max_rel, leaf_rel)
    print(f"fused-path DP==single max grad rel err {max_rel:.2e}")
