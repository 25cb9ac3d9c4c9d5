"""Context-parallel attention (SURVEY §5.7 extension point): both the
all-gather and ring implementations must match single-device attention
exactly on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from v1t_tpu.ops.attention import _attention_xla
from v1t_tpu.parallel.sequence import allgather_attention, ring_attention


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()), axis_names=("seq",))


def _qkv(b=2, h=2, n=64, d=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    return mk(), mk(), mk()


@pytest.mark.parametrize("impl", [allgather_attention, ring_attention])
@pytest.mark.parametrize("use_lsa", [False, True])
def test_matches_single_device(mesh, impl, use_lsa):
    q, k, v = _qkv()
    scale = jnp.float32(16**-0.5)
    ref = _attention_xla(q, k, v, scale, use_lsa, 0.0, True, None, False)
    out = impl(q, k, v, scale, mesh=mesh, use_lsa=use_lsa)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("impl", [allgather_attention, ring_attention])
def test_gradients_match(mesh, impl):
    q, k, v = _qkv(seed=1)
    scale = jnp.float32(16**-0.5)

    def loss(fn):
        return jax.grad(
            lambda q, k, v: jnp.sum(fn(q, k, v) ** 2), argnums=(0, 1, 2)
        )

    g_ref = loss(lambda q, k, v: _attention_xla(q, k, v, scale, False, 0.0,
                                                True, None, False))(q, k, v)
    g_par = loss(lambda q, k, v: impl(q, k, v, scale, mesh=mesh))(q, k, v)
    for a, b in zip(g_par, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_full_resolution_token_count_shards(mesh):
    """The full-image config (144x256, patch 8, stride 4 here for test size)
    must shard its token axis over the mesh without remainder handling by
    padding to the shard count."""
    n = 34112  # ~ the full-resolution token count, divisible by 8
    q, k, v = _qkv(b=1, h=1, n=256, d=8)  # small stand-in for runtime
    scale = jnp.float32(8**-0.5)
    out = allgather_attention(q, k, v, scale, mesh=mesh)
    assert out.shape == q.shape
    assert n % mesh.shape["seq"] == 0


# --- model + trainer wiring (round-2: --sequence_parallel config path) --------


def _seq_model(precision="fp32"):
    from v1t_tpu.configs import Config
    from v1t_tpu.data.cards import synthetic_data_card
    from v1t_tpu.models import build_model
    from v1t_tpu.models.model import init_model

    config = Config(
        core="vit", readout="gaussian2d", behavior_mode=3, shift_mode=2,
        precision=precision, attention_impl="xla", resize_image=0,
        num_blocks=2, emb_dim=16, num_heads=2, mlp_dim=32,
        patch_size=8, patch_stride=4,  # (32, 64) input -> 106 tokens
    )
    card = synthetic_data_card(
        mouse_ids=("A",), num_neurons=64, input_shape=(1, 32, 64)
    )
    model = build_model(config, card)
    params = init_model(model, seed=0, batch_size=1)
    return config, card, model, params


def _fwd(model, params):
    rng = np.random.default_rng(0)
    out, _, _ = model.apply(
        {"params": params},
        jnp.asarray(rng.normal(size=(8, 1, 32, 64)), jnp.float32),
        mouse_id="A",
        behaviors=jnp.asarray(rng.normal(size=(8, 3)), jnp.float32),
        pupil_centers=jnp.asarray(rng.normal(size=(8, 2)), jnp.float32),
        train=False,
    )
    return np.asarray(out)


@pytest.mark.parametrize("impl", ["allgather", "ring"])
def test_vit_core_seq_parallel_forward_parity(impl):
    """The full model routed through sequence-parallel attention (106 tokens
    padded to 112 over 8 shards) must match the single-device forward."""
    from v1t_tpu.parallel.context import sequence_mesh, set_sequence_mesh

    config, card, model, params = _seq_model()
    ref = _fwd(model, params)
    seq_mesh = Mesh(np.asarray(jax.devices()), axis_names=("seq",))
    set_sequence_mesh(seq_mesh, axis="seq", impl=impl)
    try:
        assert sequence_mesh() is not None
        out = _fwd(model, params)
    finally:
        set_sequence_mesh(None)
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5)


def test_train_step_dp_times_sp_mesh():
    """One full training step on a ("data", "seq") = (2, 4) mesh: DP batch
    sharding composes with token sharding; gradients stay finite and the
    update applies."""
    from v1t_tpu import training
    from v1t_tpu.parallel.context import set_sequence_mesh
    from v1t_tpu.parallel.mesh import DataParallel

    config, card, model, params = _seq_model()
    config.batch_size = 8
    mesh = DataParallel.create(sequence_parallel=4)
    assert mesh is not None and mesh.mesh.shape == {"data": 2, "seq": 4}
    assert mesh.data_size == 2
    set_sequence_mesh(
        mesh.mesh, axis="seq", impl="allgather", batch_axis="data"
    )
    try:
        trainer = training.Trainer(config, model, params, card, mesh=mesh)
        rng = np.random.default_rng(0)
        batch = {
            "image": rng.normal(size=(8, 1, 32, 64)).astype(np.float32),
            "response": rng.poisson(2.0, size=(8, 64)).astype(np.float32),
            "behavior": rng.normal(size=(8, 3)).astype(np.float32),
            "pupil_center": rng.normal(size=(8, 2)).astype(np.float32),
        }
        before = np.asarray(
            jax.tree_util.tree_leaves(trainer.params)[0]
        ).copy()
        _, metrics = trainer.train_step("A", batch, acc_grads=None, update=True)
        assert np.isfinite(float(metrics["loss/total_loss"]))
        after = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0])
        assert not np.allclose(before, after)
    finally:
        set_sequence_mesh(None)


def test_seq_parallel_dropout_trains():
    """Attention-probability dropout under sequence parallelism: training
    forward must differ from eval forward and stay finite."""
    from v1t_tpu.parallel.context import set_sequence_mesh

    config, card, model, params = _seq_model()
    seq_mesh = Mesh(np.asarray(jax.devices()), axis_names=("seq",))
    set_sequence_mesh(seq_mesh, axis="seq", impl="ring")
    try:
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.normal(size=(4, 1, 32, 64)), jnp.float32)
        kwargs = dict(
            mouse_id="A",
            behaviors=jnp.asarray(rng.normal(size=(4, 3)), jnp.float32),
            pupil_centers=jnp.asarray(rng.normal(size=(4, 2)), jnp.float32),
        )
        eval_out, _, _ = model.apply(
            {"params": params}, images, train=False, **kwargs
        )
        train_out, _, _ = model.apply(
            {"params": params}, images, train=True,
            rngs={"dropout": jax.random.key(0),
                  "droppath": jax.random.key(1),
                  "sample": jax.random.key(2)},
            **kwargs,
        )
        assert np.isfinite(np.asarray(train_out)).all()
        assert not np.allclose(np.asarray(train_out), np.asarray(eval_out))
    finally:
        set_sequence_mesh(None)


def test_sp_bypasses_fused_attention_predicate():
    """--sequence_parallel takes the composed attention path, giving up the
    fused sublayer kernel at small token counts (documented trade, warned
    in train.py): the predicate fires exactly when the fused kernel would
    have engaged on a single TPU chip."""
    from v1t_tpu.configs import Config
    from v1t_tpu.models.cores.vit import (
        FUSED_MAX_N,
        sp_bypasses_fused_attention,
    )

    bf16 = Config(precision="bf16", attention_impl="auto")
    # flagship 1654 tokens: fused path would engage -> SP costs kernel speed
    assert sp_bypasses_fused_attention(bf16, 1654)
    # full-resolution 34k tokens: beyond the fused kernel's VMEM envelope,
    # SP gives up nothing
    assert not sp_bypasses_fused_attention(bf16, FUSED_MAX_N + 1)
    # fp32 / xla paths never used the fused kernel
    assert not sp_bypasses_fused_attention(
        Config(precision="fp32", attention_impl="auto"), 1654
    )
    assert not sp_bypasses_fused_attention(
        Config(precision="bf16", attention_impl="xla"), 1654
    )
