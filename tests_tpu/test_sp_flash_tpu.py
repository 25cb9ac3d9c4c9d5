"""TPU tests for the sequence-parallel flash building block:
``flash_attention_with_lse`` (rectangular q/k, LSE export, dlse backward)
and its LSE combination — the kernel-grade path inside
v1t_tpu/parallel/sequence.py's shard_map bodies (SURVEY §5.7)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from v1t_tpu.ops.flash_attention import flash_attention_with_lse
from v1t_tpu.parallel.sequence import (
    _combine_lse,
    _einsum_block,
    _flash_block,
    allgather_attention,
    ring_attention,
)

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="requires TPU hardware",
)


def _qkv(b=2, h=2, nq=64, nk=192, d=32, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(b, h, nq, d)) * 0.3, dtype),
        jnp.asarray(rng.normal(size=(b, h, nk, d)) * 0.3, dtype),
        jnp.asarray(rng.normal(size=(b, h, nk, d)) * 0.3, dtype),
    )


@pytest.fixture(params=["0", "1"], ids=["legacy", "dt"])
def dt_mode(request, monkeypatch):
    """Both blocked-kernel orientations (see flash_attention._use_dt_blocked;
    the dt form is what long-sequence SP shards actually run)."""
    monkeypatch.setenv("V1T_FLASH_DT_BLOCKED", request.param)
    return request.param


def test_rectangular_flash_matches_einsum(dt_mode):
    """q 64 tokens against 192 keys with the tail 32 masked."""
    q, k, v = _qkv()
    out, lse = jax.jit(
        functools.partial(flash_attention_with_lse, n_real_k=160)
    )(q, k, v)
    ref_out, ref_lse = _einsum_block(
        q, k, v, use_lsa=False, q_offset=0, k_offset=0, n_real=160
    )
    # the dt orientation accumulates the fp32 matmuls in a different order
    # than XLA's einsum (measured 3.5e-5 max abs vs 1.2e-5 for the legacy
    # tiles); both are fp32-level agreement — production dtype is bf16
    tol = 1e-4 if dt_mode == "1" else 2e-5
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), rtol=tol, atol=tol
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref_lse)[..., 0], rtol=2e-5, atol=2e-5
    )


def test_two_block_lse_combination_matches_full_attention(dt_mode):
    """Split the keys in two flash calls and combine via LSE — must equal
    single full attention, forward AND gradients (the gradient flows through
    the returned LSE, exercising the dlse -> delta backward fold)."""
    q, k, v = _qkv(nq=128, nk=256)
    ct = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 2, 128, 32)), jnp.float32
    )

    def combined(q, k, v):
        o1, l1 = _flash_block(q, k[:, :, :128], v[:, :, :128])
        o2, l2 = _flash_block(q, k[:, :, 128:], v[:, :, 128:])
        out, _ = _combine_lse(o1, l1, o2, l2)
        return jnp.sum(out * ct)

    def full(q, k, v):
        out, _ = _einsum_block(
            q, k, v, use_lsa=False, q_offset=0, k_offset=0
        )
        return jnp.sum(out * ct)

    val_c, grads_c = jax.jit(jax.value_and_grad(combined, argnums=(0, 1, 2)))(q, k, v)
    val_f, grads_f = jax.jit(jax.value_and_grad(full, argnums=(0, 1, 2)))(q, k, v)
    # tolerance: fp32 matmuls take bf16 MXU passes at default precision, so
    # the two paths carry ~1e-3-absolute noise with different blockings
    # (measured max |diff| 9.1e-4 on O(0.05) gradients); a missing dlse term
    # in the backward would err at the gradient's own magnitude
    np.testing.assert_allclose(float(val_c), float(val_f), rtol=3e-3)
    for name, gc, gf in zip("qkv", grads_c, grads_f):
        np.testing.assert_allclose(
            np.asarray(gc), np.asarray(gf), rtol=2e-2, atol=2e-3,
            err_msg=f"d{name} diverged through the LSE combination",
        )


@pytest.mark.parametrize("fn", [allgather_attention, ring_attention])
def test_sp_bodies_dispatch_flash_on_tpu(fn):
    """On a (1-device) seq mesh the shard_map bodies must route through the
    flash kernel and still match the exact einsum computation."""
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("seq",))
    q, k, v = _qkv(nq=192, nk=192, dtype=jnp.bfloat16)
    out = jax.jit(
        lambda q, k, v: fn(q, k, v, scale=0.25, mesh=mesh, n_real=192)
    )(q, k, v)
    ref, _ = _einsum_block(
        q.astype(jnp.float32) * 0.25, k.astype(jnp.float32),
        v.astype(jnp.float32), use_lsa=False, q_offset=0, k_offset=0,
        n_real=192,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )
    # the jitted body must actually contain the Pallas custom call
    hlo = (
        jax.jit(lambda q, k, v: fn(q, k, v, scale=0.25, mesh=mesh, n_real=192))
        .lower(q, k, v).compile().as_text()
    )
    assert "tpu_custom_call" in hlo, "SP body fell back to einsum on TPU"
