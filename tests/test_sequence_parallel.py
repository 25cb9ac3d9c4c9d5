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
