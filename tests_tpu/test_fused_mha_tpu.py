"""TPU tests for the fused attention-sublayer kernel
(v1t_tpu/ops/fused_mha.py) — parity vs the composed XLA path and dispatch
assertion for the model's "auto" attention_impl.

Shipped numbers (v5e, V1T shape B=64, N=1654, E=155, H=4, dropout 0.2544):
the kernel replaced 6.1 + 13.3 ms/layer of split-kernel time PLUS
~18 ms/layer of XLA reshapes/pads/concats/projections; with LayerNorm
folded in, the full V1T train step is ~124 ms (516 images/s/chip).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v1t_tpu.ops.attention import multi_head_attention
from v1t_tpu.ops.fused_mha import fused_mha

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="requires TPU hardware",
)


def _params(b=3, n=300, e=32, h=4, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(b, n, e)) * 0.5, jnp.bfloat16),
        jnp.asarray(1 + 0.1 * rng.normal(size=e), jnp.float32),   # gamma
        jnp.asarray(0.1 * rng.normal(size=e), jnp.float32),       # beta
        jnp.asarray(rng.normal(size=(3, h, e, e)) * 0.08, jnp.bfloat16),
        jnp.asarray(rng.normal(size=(h, e, e)) * 0.08, jnp.bfloat16),
        jnp.asarray(rng.normal(size=(e,)) * 0.1, jnp.bfloat16),
        jnp.asarray(
            np.full(h, e**-0.5) * (1 + 0.1 * rng.normal(size=h)), jnp.float32
        ),
    )


def _composed(x, gamma, beta, wqkv, wp, bp, scale, use_lsa):
    """Reference: LN + projections in XLA + the materializing attention."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    x = (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
    q = jnp.einsum("bne,hed->bhnd", x, wqkv[0].astype(jnp.float32))
    k = jnp.einsum("bne,hed->bhnd", x, wqkv[1].astype(jnp.float32))
    v = jnp.einsum("bne,hed->bhnd", x, wqkv[2].astype(jnp.float32))
    o = multi_head_attention(
        q, k, v, scale, use_lsa=use_lsa, deterministic=True, impl="xla"
    )
    return jnp.einsum("bhnd,hde->bne", o, wp.astype(jnp.float32)) + bp.astype(
        jnp.float32
    )


@pytest.mark.parametrize("use_lsa", [False, True])
def test_forward_parity(use_lsa):
    args = _params()
    ref = _composed(*args, use_lsa)
    out = fused_mha(*args, use_lsa=use_lsa, deterministic=True)
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) < 5e-3
    assert np.isfinite(np.asarray(out, jnp.float32)).all()


def test_gradient_parity():
    args = _params()

    def loss(fn, *a):
        return jnp.sum(fn(*a).astype(jnp.float32) ** 2)

    g_fused = jax.grad(
        lambda *a: loss(
            functools.partial(fused_mha, use_lsa=True, deterministic=True), *a
        ),
        argnums=tuple(range(7)),
    )(*args)
    g_ref = jax.grad(
        lambda *a: loss(functools.partial(_composed, use_lsa=True), *a),
        argnums=tuple(range(7)),
    )(*args)
    for name, a, b in zip(
        ("dx", "dgamma", "dbeta", "dwqkv", "dwp", "dbp", "dscale"),
        g_fused, g_ref,
    ):
        rel = float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b))
            / (jnp.max(jnp.abs(b)) + 1e-9)
        )
        assert rel < 2e-2, (name, rel)


def test_dropout_statistics_and_determinism():
    args = _params()
    key = jax.random.key(7)
    run = lambda k: fused_mha(
        *args, use_lsa=True, dropout_rate=0.5,
        deterministic=False, rng=k,
    )
    a = run(key)
    b = run(key)
    c = run(jax.random.key(8))
    # same rng -> identical (forward/backward mask regeneration relies on it)
    assert jnp.array_equal(a, b)
    assert not jnp.array_equal(a, c)
    assert np.isfinite(np.asarray(a, jnp.float32)).all()


def test_pad_once_mode_matches_unpadded():
    """n_real (pad-once) mode: pre-padded input through the same kernel
    config must produce identical real rows, exactly-zero pad rows, and
    identical gradients (pad-row cotangents zero)."""
    from v1t_tpu.ops.fused_mha import _choose_blocks

    args = _params(b=2, n=300, e=32, h=2, seed=3)
    x = args[0]
    n = x.shape[1]
    npad = _choose_blocks(n)[0]
    x_pad = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
    key = jax.random.key(11)

    kw = dict(use_lsa=True, dropout_rate=0.3, deterministic=False, rng=key)
    ref = fused_mha(x, *args[1:], **kw)
    out = fused_mha(x_pad, *args[1:], **kw, n_real=n)
    assert out.shape == (2, npad, 32)
    assert jnp.array_equal(out[:, :n, :], ref)
    assert jnp.array_equal(
        out[:, n:, :], jnp.zeros_like(out[:, n:, :])
    ), "pad rows must be exactly zero"

    def loss_pad(x_pad, *rest):
        o = fused_mha(x_pad, *rest, **kw, n_real=n)
        return jnp.sum(o[:, :n, :].astype(jnp.float32) ** 2)

    def loss_ref(x, *rest):
        return jnp.sum(fused_mha(x, *rest, **kw).astype(jnp.float32) ** 2)

    g_pad = jax.grad(loss_pad, argnums=(0, 3, 4))(x_pad, *args[1:])
    g_ref = jax.grad(loss_ref, argnums=(0, 3, 4))(x, *args[1:])
    assert jnp.array_equal(g_pad[0][:, :n, :], g_ref[0])
    assert jnp.array_equal(
        g_pad[0][:, n:, :], jnp.zeros_like(g_pad[0][:, n:, :])
    ), "pad-row input gradients must be exactly zero"
    for a, b in zip(g_pad[1:], g_ref[1:]):
        assert jnp.array_equal(a, b)


def test_fold_out_dropout():
    """Folded output dropout: deterministic given the rng, a no-op when
    deterministic=True, drops ~rate of the entries, and the projection-bias
    gradient (computed in-kernel from the masked cotangent) matches a
    finite difference."""
    args = _params(b=2, n=300, e=32, h=2, seed=9)
    key = jax.random.key(3)

    # no-op when deterministic
    a = fused_mha(*args, deterministic=True, dropout_rate=0.5,
                  fold_out_dropout=True)
    b_ = fused_mha(*args, deterministic=True, dropout_rate=0.5)
    assert jnp.array_equal(a, b_)

    run = lambda k: fused_mha(
        *args, dropout_rate=0.4, deterministic=False, rng=k,
        fold_out_dropout=True,
    )
    o1, o2, o3 = run(key), run(key), run(jax.random.key(5))
    assert jnp.array_equal(o1, o2)
    assert not jnp.array_equal(o1, o3)
    zero_frac = float(jnp.mean((o1 == 0).astype(jnp.float32)))
    assert 0.3 < zero_frac < 0.5, zero_frac

    # bias gradient through the folded dropout: finite difference
    def loss(bp):
        out = fused_mha(
            args[0], args[1], args[2], args[3], args[4], bp, args[6],
            dropout_rate=0.4, deterministic=False, rng=key,
            fold_out_dropout=True,
        )
        return jnp.sum(out.astype(jnp.float32))

    bp = args[5]
    g = jax.grad(loss)(bp).astype(jnp.float32)
    eps = 0.5
    e0 = jnp.zeros_like(bp).at[7].set(eps)
    fd = (loss(bp + e0) - loss(bp - e0)) / (2 * eps)
    assert abs(float(g[7]) - float(fd)) < 0.05 * abs(float(fd)) + 1.0, (
        float(g[7]), float(fd),
    )


def test_fold_residual():
    """fold_residual emits sublayer(x) + x exactly (same bf16 add as XLA)
    and routes the skip cotangent: dx_fold ~= dx + dout."""
    args = _params(b=2, n=300, e=32, h=2, seed=13)
    x = args[0]
    key = jax.random.key(2)
    kw = dict(use_lsa=True, dropout_rate=0.3, deterministic=False, rng=key,
              fold_out_dropout=True)

    out_fold = fused_mha(*args, **kw, fold_residual=True)
    out_ref = fused_mha(*args, **kw) + x
    assert jnp.array_equal(out_fold, out_ref)

    def loss(fn_kw, x, wqkv):
        o = fused_mha(x, args[1], args[2], wqkv, *args[4:], **kw, **fn_kw)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gx_f, gw_f = jax.grad(
        functools.partial(loss, dict(fold_residual=True)), (0, 1)
    )(x, args[3])

    def loss_ref(x, wqkv):
        o = fused_mha(x, args[1], args[2], wqkv, *args[4:], **kw) + x
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gx_r, gw_r = jax.grad(loss_ref, (0, 1))(x, args[3])
    for a, b in ((gx_f, gx_r), (gw_f, gw_r)):
        rel = float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
            / (jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-9)
        )
        assert rel < 1e-2, rel


def test_bias_row_fold():
    """bias_row (the folded behavior-latent add): fused(x, bias_row=bl) must
    equal fused(x + bl[:, None, :]) bit-for-bit in values and gradients,
    with d(bias_row) = row-sum of dz."""
    args = _params(b=2, n=300, e=32, h=2, seed=21)
    x = args[0]
    bl = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 32)) * 0.3, jnp.bfloat16
    )
    key = jax.random.key(9)
    kw = dict(use_lsa=True, dropout_rate=0.3, deterministic=False, rng=key,
              fold_out_dropout=True, fold_residual=True)

    out_fold = fused_mha(x, *args[1:], **kw, bias_row=bl)
    out_ref = fused_mha(x + bl[:, None, :], *args[1:], **kw)
    assert jnp.array_equal(out_fold, out_ref)

    def loss_fold(x, bl):
        o = fused_mha(x, *args[1:], **kw, bias_row=bl)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(x, bl):
        o = fused_mha(x + bl[:, None, :], *args[1:], **kw)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gx_f, gb_f = jax.grad(loss_fold, (0, 1))(x, bl)
    gx_r, gb_r = jax.grad(loss_ref, (0, 1))(x, bl)
    for a, b in ((gx_f, gx_r), (gb_f, gb_r)):
        rel = float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
            / (jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-9)
        )
        assert rel < 1e-2, rel


def test_model_auto_dispatch_uses_fused_kernel():
    """attention_impl='auto' + bf16 on TPU must lower the vit core through
    the fused kernel (regression guard: a silent fallback would cost ~40%
    step time)."""
    from v1t_tpu.configs import Config
    from v1t_tpu.data.cards import synthetic_data_card
    from v1t_tpu.models import build_model
    from v1t_tpu.models.model import init_model

    config = Config(
        core="vit", readout="gaussian2d", behavior_mode=3, shift_mode=2,
        precision="bf16", attention_impl="auto", readout_impl="auto",
        resize_image=0, num_blocks=1, emb_dim=16, num_heads=2, mlp_dim=32,
        patch_size=8, patch_stride=8,
    )
    card = synthetic_data_card(
        mouse_ids=("A",), num_neurons=512, input_shape=(1, 36, 64)
    )
    model = build_model(config, card)
    params = init_model(model, seed=0, batch_size=1)
    rng = np.random.default_rng(0)
    args = (
        jnp.asarray(rng.normal(size=(2, 1, 36, 64)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 2)), jnp.float32),
    )

    def fwd(params, images, behaviors, pupils):
        out, _, _ = model.apply(
            {"params": params}, images, mouse_id="A", behaviors=behaviors,
            pupil_centers=pupils, train=False,
        )
        return out

    hlo = jax.jit(fwd).lower(params, *args).compile().as_text()
    assert "ops/fused_mha.py" in hlo, "vit fell back to the composed path"


@pytest.mark.parametrize("dt_form", [1, 2])
def test_dt_vs_legacy_kernels(dt_form):
    """The dt-form (transposed-operand) whole-sequence kernels must agree
    with the legacy blocked kernels: same math, different MXU orientation —
    only bf16 accumulation-order noise may differ. Dropout masks are
    regenerated from the same (seed, uid) streams, so stochastic outputs
    are compared with the SAME rng. Parametrized over dt1 AND dt2 (the
    production default) — ADVICE r4: `True` silently meant dt1 only."""
    import v1t_tpu.ops.fused_mha as m

    args = _params(b=2, n=300, e=32, h=4)

    def run(dt, **kw):
        old = m._DT_FORM
        m._DT_FORM = dt
        try:
            return fused_mha(*args, **kw)
        finally:
            m._DT_FORM = old

    for kw in (
        dict(deterministic=True),
        dict(deterministic=True, use_lsa=True),
    ):
        a = run(dt_form, **kw).astype(jnp.float32)
        b = run(0, **kw).astype(jnp.float32)
        assert float(jnp.max(jnp.abs(a - b))) < 3e-3, kw

    # gradients: dt vs legacy on the same loss
    def loss(dt, *a):
        old = m._DT_FORM
        m._DT_FORM = dt
        try:
            out = fused_mha(*a, use_lsa=True, deterministic=True)
        finally:
            m._DT_FORM = old
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_dt = jax.grad(
        functools.partial(loss, dt_form), argnums=tuple(range(7))
    )(*args)
    g_le = jax.grad(functools.partial(loss, 0), argnums=tuple(range(7)))(
        *args
    )
    names = ("x", "gamma", "beta", "wqkv", "wp", "bp", "scale")
    for name, a, b in zip(names, g_dt, g_le):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        denom = float(jnp.max(jnp.abs(b))) + 1e-6
        rel = float(jnp.max(jnp.abs(a - b))) / denom
        assert rel < 2e-2, (name, rel)


@pytest.mark.parametrize(
    "b,n,e,h",
    [
        (1, 128, 16, 1),    # single head, minimal rows
        (2, 129, 32, 3),    # non-128-multiple tokens, odd head count
        (1, 2048, 24, 2),   # whole-sequence boundary (WHOLE_SEQ_MAX)
        (2, 2176, 16, 2),   # just past the boundary: blocked fallback
    ],
)
def test_dt_shape_sweep(b, n, e, h):
    """dt kernels across shape corners: parity vs the composed XLA path
    for both deterministic and LSA variants."""
    args = _params(b=b, n=n, e=e, h=h, seed=b + n)
    out = fused_mha(*args, deterministic=True)
    ref = _composed(*args, use_lsa=False)
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) < 6e-3
    out = fused_mha(*args, deterministic=True, use_lsa=True)
    ref = _composed(*args, use_lsa=True)
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) < 6e-3
