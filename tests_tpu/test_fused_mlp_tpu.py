"""TPU tests for the fused MLP-sublayer kernel (v1t_tpu/ops/fused_mlp.py):
parity vs the composed XLA path (LN -> fc1 -> exact GELU -> dropout -> fc2
-> dropout) and model dispatch.

Shipped numbers (v5e, V1T batch 64): full train step 138 -> ~130 ms
(465 -> 490 images/s/chip) — the XLA version kept the MLP activations in an
n-minor layout island whose boundary conversions doubled its cost.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v1t_tpu.ops.fused_mlp import fused_mlp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="requires TPU hardware",
)


def _params(b=3, n=300, e=32, f=96, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(b, n, e)) * 0.5, jnp.bfloat16),
        jnp.asarray(1 + 0.1 * rng.normal(size=e), jnp.float32),
        jnp.asarray(0.1 * rng.normal(size=e), jnp.float32),
        jnp.asarray(rng.normal(size=(e, f)) * 0.1, jnp.bfloat16),
        jnp.asarray(0.1 * rng.normal(size=f), jnp.float32),
        jnp.asarray(rng.normal(size=(f, e)) * 0.1, jnp.bfloat16),
        jnp.asarray(0.1 * rng.normal(size=e), jnp.float32),
    )


def _composed(x, gamma, beta, w1, b1, w2, b2):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    ln = (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
    h = ln @ w1.astype(jnp.float32) + b1
    return jax.nn.gelu(h, approximate=False) @ w2.astype(jnp.float32) + b2


def test_forward_parity():
    args = _params()
    ref = _composed(*args)
    out = fused_mlp(*args, deterministic=True).astype(jnp.float32)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-2  # bf16-bounded


def test_gradient_parity():
    args = _params()

    def loss(fn, *a):
        return jnp.sum(fn(*a).astype(jnp.float32) ** 2)

    gf = jax.grad(
        lambda *a: loss(lambda *b: fused_mlp(*b, deterministic=True), *a),
        argnums=tuple(range(7)),
    )(*args)
    gr = jax.grad(lambda *a: loss(_composed, *a), argnums=tuple(range(7)))(
        *args
    )
    for name, a, b in zip(("dx", "dg", "db", "dw1", "db1", "dw2", "db2"), gf, gr):
        rel = float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b))
            / (jnp.max(jnp.abs(b)) + 1e-9)
        )
        assert rel < 1e-2, (name, rel)


def test_pad_once_mode_matches_unpadded():
    """n_real (pad-once) mode: identical real rows, exactly-zero pad rows,
    identical gradients with zero pad-row cotangents."""
    from v1t_tpu.ops.fused_mlp import _choose_rows

    args = _params(seed=5)
    x = args[0]
    n = x.shape[1]
    npad = _choose_rows(n)
    x_pad = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
    kw = dict(dropout_rate=0.3, deterministic=False, rng=jax.random.key(4))

    ref = fused_mlp(x, *args[1:], **kw)
    out = fused_mlp(x_pad, *args[1:], **kw, n_real=n)
    assert out.shape == (x.shape[0], npad, x.shape[2])
    assert jnp.array_equal(out[:, :n, :], ref)
    assert jnp.array_equal(out[:, n:, :], jnp.zeros_like(out[:, n:, :]))

    def loss_pad(x_pad, w1, w2):
        o = fused_mlp(x_pad, args[1], args[2], w1, args[4], w2, args[6],
                      **kw, n_real=n)
        return jnp.sum(o[:, :n, :].astype(jnp.float32) ** 2)

    def loss_ref(x, w1, w2):
        o = fused_mlp(x, args[1], args[2], w1, args[4], w2, args[6], **kw)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g_pad = jax.grad(loss_pad, argnums=(0, 1, 2))(x_pad, args[3], args[5])
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, args[3], args[5])
    assert jnp.array_equal(g_pad[0][:, :n, :], g_ref[0])
    assert jnp.array_equal(
        g_pad[0][:, n:, :], jnp.zeros_like(g_pad[0][:, n:, :])
    )
    for a, b in zip(g_pad[1:], g_ref[1:]):
        assert jnp.array_equal(a, b)


def test_fold_residual():
    """fold_residual emits mlp(x) + x exactly and routes the skip
    cotangent in the backward."""
    args = _params(seed=7)
    x = args[0]
    kw = dict(dropout_rate=0.3, deterministic=False, rng=jax.random.key(6))

    out_fold = fused_mlp(*args, **kw, fold_residual=True)
    out_ref = fused_mlp(*args, **kw) + x
    assert jnp.array_equal(out_fold, out_ref)

    def loss(fold, x, w1):
        o = fused_mlp(x, args[1], args[2], w1, *args[4:], **kw,
                      fold_residual=fold)
        if not fold:
            o = o + x
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gx_f, gw_f = jax.grad(lambda *a: loss(True, *a), (0, 1))(x, args[3])
    gx_r, gw_r = jax.grad(lambda *a: loss(False, *a), (0, 1))(x, args[3])
    for a, b in ((gx_f, gx_r), (gw_f, gw_r)):
        rel = float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
            / (jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-9)
        )
        assert rel < 1e-2, rel


def test_dropout_determinism():
    args = _params()
    run = lambda k: fused_mlp(
        *args, dropout_rate=0.5, deterministic=False, rng=k
    )
    a = run(jax.random.key(1))
    b = run(jax.random.key(1))
    c = run(jax.random.key(2))
    assert jnp.array_equal(a, b)
    assert not jnp.array_equal(a, c)
    assert np.isfinite(np.asarray(a, jnp.float32)).all()
