"""Fused transformer-MLP sublayer kernel for the V1T core.

One Pallas kernel per direction computes LayerNorm -> fc1 -> exact GELU ->
dropout -> fc2 -> dropout (reference src/v1t/models/core/vit.py:132-154,
everything between the residual reads). Motivation (profiled at V1T batch
64): XLA keeps the MLP's activations in an n-minor layout island whose
boundary conversions double the sublayer's cost (isolated fwd+bwd 1.4 ms vs
2.9 ms in-model), and the dropout mask generation + LayerNorm run as
separate passes over 100+ MB activations. The kernel pins standard layouts,
regenerates dropout masks from counter seeds in the backward (nothing
stored), and keeps the hidden activations entirely in VMEM per row-block —
only x, the weights and the output touch HBM.

Grid: (batch, row-block) over the token axis; weights resident.
Backward: recomputes the forward per row-block from x (flash-style), emits
dx directly and per-batch weight-gradient partials summed by XLA.
"""

from __future__ import annotations

import functools
import typing as t

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from v1t_tpu.ops.common import pallas_call as _pallas_call

from v1t_tpu.ops.flash_attention import _keep_draw, _round_up

BLOCK_R = 512  # token rows per program (sequences too long for whole-row mode)
# whole-row mode: a single row-block per batch — only lane-tile alignment
# (128) pads the token axis (V1T: 1664 rows vs 2048 with 512-row blocks,
# 19% less work). The (rows, hidden) fp32 temporaries must fit VMEM.
WHOLE_ROWS_MAX = 2048


def _block_r(npad: int) -> int:
    return npad if npad <= WHOLE_ROWS_MAX else BLOCK_R


def _choose_rows(n: int) -> int:
    npad128 = _round_up(n, 128)
    if npad128 <= WHOLE_ROWS_MAX:
        return npad128
    return _round_up(n, BLOCK_R)


def _keep_mask(seed, uid, shape, keep_prob):
    # 16-bit draws (two per PRNG word) — see flash_attention._keep_draw
    pltpu.prng_seed(seed + uid)
    return _keep_draw(shape, keep_prob)


def _layernorm(x32, gamma, beta, eps=1e-5):  # torch nn.LayerNorm default
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * inv
    return xhat * gamma + beta, xhat, inv


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation (max abs error
    1.5e-7 — far below bf16 resolution). Mosaic has no erf primitive."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741
            + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    # exact erf formulation (torch nn.GELU default, reference vit.py MLP)
    return 0.5 * x * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0))))


def _dgelu(x):
    return 0.5 * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0)))) + (
        x * jnp.exp(-0.5 * x * x) * np.float32(1.0 / np.sqrt(2.0 * np.pi))
    )


def _gelu_and_dgelu(x):
    """gelu(x) and gelu'(x) sharing ONE erf evaluation. Bit-identical to
    calling _gelu and _dgelu separately (0.5x multiplies are exact, so the
    product rounds once either way). Measured a WASH on the sublayer bench
    (misc/bench_mlp_ablate.py) — Mosaic already CSE'd the two _erf(x/√2)
    calls — but kept: the sharing is now explicit in the source instead of
    relying on compiler CSE. GELU itself (one A&S erf + the gaussian term)
    is the sublayer's largest VPU cost (~0.86 ms of ~2.0 ms per-block
    backward at B=96); a 2-piece polynomial erf and a tanh-approx GELU
    were both benched — the polynomial is SLOWER (op count beats the
    div/exp units) and tanh changes numerics (3e-4 vs 1.5e-7 error) for
    ~0.5 ms/block — rejected, see BENCH_NOTES round 5."""
    half_erfc = 0.5 * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0))))
    a = x * half_erfc
    da = half_erfc + (
        x * jnp.exp(-0.5 * x * x) * np.float32(1.0 / np.sqrt(2.0 * np.pi))
    )
    return a, da


def _mlp_fwd_kernel(
    seed_ref, x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
    *, dropout_rate: float, deterministic: bool, nr: int, n_real: int,
    fold_residual: bool,
):
    bi, ri = pl.program_id(0), pl.program_id(1)
    x32 = x_ref[0].astype(jnp.float32)
    ln, _, _ = _layernorm(x32, g_ref[0], b_ref[0])
    h = jax.lax.dot(
        ln.astype(x_ref.dtype), w1_ref[...],
        preferred_element_type=jnp.float32,
    ) + b1_ref[0]
    a = _gelu(h)
    if dropout_rate > 0.0 and not deterministic:
        uid = (bi * nr + ri) * 2
        keep = _keep_mask(seed_ref[0], uid, a.shape, 1.0 - dropout_rate)
        a = jnp.where(keep, a / (1.0 - dropout_rate), 0.0)
    y = jax.lax.dot(
        a.astype(x_ref.dtype), w2_ref[...],
        preferred_element_type=jnp.float32,
    ) + b2_ref[0]
    if dropout_rate > 0.0 and not deterministic:
        uid2 = (bi * nr + ri) * 2 + 1
        keep2 = _keep_mask(seed_ref[0], uid2, y.shape, 1.0 - dropout_rate)
        y = jnp.where(keep2, y / (1.0 - dropout_rate), 0.0)
    # zero the padded rows: keeps the residual stream's pad rows exactly
    # zero in pad-once (whole-transformer padded) mode
    block_r = out_ref.shape[1]
    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, y.shape, 0) + ri * block_r
    )
    y = jnp.where(row_ids < n_real, y, 0.0)
    out = y.astype(out_ref.dtype)
    if fold_residual:
        # emit mlp(x) + x (bf16 add, same rounding as the XLA residual add)
        out = out + x_ref[0]
    out_ref[0] = out


def _mlp_bwd_kernel(
    seed_ref, x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, do_ref,
    dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    dg_scr, db_scr, dw1_scr, db1_scr, dw2_scr, db2_scr,
    *, dropout_rate: float, deterministic: bool, nr: int, n_real: int,
    fold_residual: bool,
):
    # n_real is unused: pad rows of the incoming cotangent are zero by the
    # pad-once invariant, so every pad-row gradient is exactly zero already
    bi, ri = pl.program_id(0), pl.program_id(1)

    @pl.when(ri == 0)
    def _init():
        dg_scr[...] = jnp.zeros_like(dg_scr)
        db_scr[...] = jnp.zeros_like(db_scr)
        dw1_scr[...] = jnp.zeros_like(dw1_scr)
        db1_scr[...] = jnp.zeros_like(db1_scr)
        dw2_scr[...] = jnp.zeros_like(dw2_scr)
        db2_scr[...] = jnp.zeros_like(db2_scr)

    # recompute forward for this row block
    x32 = x_ref[0].astype(jnp.float32)
    gamma, beta = g_ref[0], b_ref[0]
    ln32, xhat, inv = _layernorm(x32, gamma, beta)
    ln = ln32.astype(x_ref.dtype)
    h = jax.lax.dot(
        ln, w1_ref[...], preferred_element_type=jnp.float32
    ) + b1_ref[0]
    a, dgelu_h = _gelu_and_dgelu(h)
    inv_keep = 1.0 / (1.0 - dropout_rate)
    if dropout_rate > 0.0 and not deterministic:
        uid = (bi * nr + ri) * 2
        keep = _keep_mask(seed_ref[0], uid, a.shape, 1.0 - dropout_rate)
        a_drop = jnp.where(keep, a * inv_keep, 0.0)
    else:
        a_drop = a

    do = do_ref[0].astype(jnp.float32)
    if dropout_rate > 0.0 and not deterministic:
        uid2 = (bi * nr + ri) * 2 + 1
        keep2 = _keep_mask(seed_ref[0], uid2, do.shape, 1.0 - dropout_rate)
        do = jnp.where(keep2, do * inv_keep, 0.0)

    # fc2 backward
    dw2_scr[...] += jax.lax.dot_general(
        a_drop.astype(x_ref.dtype), do.astype(x_ref.dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    db2_scr[...] += jnp.sum(do, axis=0, keepdims=True)
    da = jax.lax.dot_general(
        do.astype(x_ref.dtype), w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0.0 and not deterministic:
        da = jnp.where(keep, da * inv_keep, 0.0)
    dh = da * dgelu_h
    # fc1 backward
    dw1_scr[...] += jax.lax.dot_general(
        ln, dh.astype(x_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_scr[...] += jnp.sum(dh, axis=0, keepdims=True)
    dln = jax.lax.dot_general(
        dh.astype(x_ref.dtype), w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # layernorm backward
    dg_scr[...] += jnp.sum(dln * xhat, axis=0, keepdims=True)
    db_scr[...] += jnp.sum(dln, axis=0, keepdims=True)
    dxhat = dln * gamma
    e = xhat.shape[-1]
    dx = inv * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    if fold_residual:
        # residual branch: the raw cotangent passes through y = f(x) + x
        dx = dx + do_ref[0].astype(jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(ri == nr - 1)
    def _emit():
        dg_ref[0] = dg_scr[...]
        db_ref[0] = db_scr[...]
        dw1_ref[0] = dw1_scr[...]
        db1_ref[0] = db1_scr[...]
        dw2_ref[0] = dw2_scr[...]
        db2_ref[0] = db2_scr[...]


def _specs(npad, e, f, block_r):
    x_spec = pl.BlockSpec((1, block_r, e), lambda bi, ri, *_: (bi, ri, 0))
    return [
        x_spec,
        pl.BlockSpec((1, e), lambda bi, ri, *_: (0, 0)),     # gamma
        pl.BlockSpec((1, e), lambda bi, ri, *_: (0, 0)),     # beta
        pl.BlockSpec((e, f), lambda bi, ri, *_: (0, 0)),     # w1
        pl.BlockSpec((1, f), lambda bi, ri, *_: (0, 0)),     # b1
        pl.BlockSpec((f, e), lambda bi, ri, *_: (0, 0)),     # w2
        pl.BlockSpec((1, e), lambda bi, ri, *_: (0, 0)),     # b2
    ], x_spec


def _mlp_forward(x_pad, gamma, beta, w1, b1, w2, b2, seed, *, cfg):
    b, npad, e = x_pad.shape
    f = w1.shape[1]
    block_r = _block_r(npad)
    nr = npad // block_r
    in_specs, x_spec = _specs(npad, e, f, block_r)
    out = _pallas_call(
        functools.partial(_mlp_fwd_kernel, nr=nr, **cfg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nr),
            in_specs=in_specs,
            out_specs=x_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((b, npad, e), x_pad.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # whole-row mode holds (rows, hidden) fp32 temporaries in VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed, x_pad, gamma, beta, w1, b1, w2, b2)
    return out


def _mlp_backward(x_pad, gamma, beta, w1, b1, w2, b2, seed, do, *, cfg):
    b, npad, e = x_pad.shape
    f = w1.shape[1]
    block_r = _block_r(npad)
    nr = npad // block_r
    in_specs, x_spec = _specs(npad, e, f, block_r)
    outs = _pallas_call(
        functools.partial(_mlp_bwd_kernel, nr=nr, **cfg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nr),
            in_specs=in_specs + [x_spec],  # do
            out_specs=[
                x_spec,                                                # dx
                pl.BlockSpec((1, 1, e), lambda bi, ri, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, ri, *_: (bi, 0, 0)),
                pl.BlockSpec((1, e, f), lambda bi, ri, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, f), lambda bi, ri, *_: (bi, 0, 0)),
                pl.BlockSpec((1, f, e), lambda bi, ri, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, ri, *_: (bi, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((1, e), jnp.float32),
                pltpu.VMEM((1, e), jnp.float32),
                pltpu.VMEM((e, f), jnp.float32),
                pltpu.VMEM((1, f), jnp.float32),
                pltpu.VMEM((f, e), jnp.float32),
                pltpu.VMEM((1, e), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, e), x_pad.dtype),
            jax.ShapeDtypeStruct((b, 1, e), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, e), jnp.float32),
            jax.ShapeDtypeStruct((b, e, f), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, f), jnp.float32),
            jax.ShapeDtypeStruct((b, f, e), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, e), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # whole-row mode holds (rows, hidden) fp32 temporaries in VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed, x_pad, gamma, beta, w1, b1, w2, b2, do)
    return outs


def _unpack_static(static_cfg):
    return dict(
        dropout_rate=static_cfg[0], deterministic=static_cfg[1],
        n_real=static_cfg[2], fold_residual=static_cfg[3],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mlp_core(static_cfg, x_pad, gamma, beta, w1, b1, w2, b2, seed):
    return _mlp_forward(
        x_pad, gamma, beta, w1, b1, w2, b2, seed,
        cfg=_unpack_static(static_cfg),
    )


def _mlp_core_fwd(static_cfg, x_pad, gamma, beta, w1, b1, w2, b2, seed):
    out = _mlp_core(static_cfg, x_pad, gamma, beta, w1, b1, w2, b2, seed)
    return out, (x_pad, gamma, beta, w1, b1, w2, b2, seed)


def _mlp_core_bwd(static_cfg, residuals, do):
    cfg = _unpack_static(static_cfg)
    x_pad, gamma, beta, w1, b1, w2, b2, seed = residuals
    dx, dg, db, dw1, db1, dw2, db2 = _mlp_backward(
        x_pad, gamma, beta, w1, b1, w2, b2, seed, do.astype(x_pad.dtype),
        cfg=cfg,
    )
    return (
        dx,
        jnp.sum(dg, axis=0),
        jnp.sum(db, axis=0),
        jnp.sum(dw1, axis=0).astype(w1.dtype),
        jnp.sum(db1, axis=0),
        jnp.sum(dw2, axis=0).astype(w2.dtype),
        jnp.sum(db2, axis=0),
        None,
    )


_mlp_core.defvjp(_mlp_core_fwd, _mlp_core_bwd)


def fused_mlp(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    rng: t.Optional[jax.Array] = None,
    n_real: t.Optional[int] = None,
    fold_residual: bool = False,
) -> jax.Array:
    """dropout(fc2(dropout(gelu(fc1(layernorm(x)))))) as one fused kernel.

    x: (B, N, E); gamma/beta: (E,) LayerNorm affine; w1: (E, F), b1: (F,),
    w2: (F, E), b2: (E,). Returns (B, N, E) — add the residual outside,
    unless ``fold_residual`` (then ``mlp(x) + x`` is emitted and the skip
    cotangent is routed in the backward). With ``n_real`` set, x is already
    padded to the kernel row multiple (pad-once mode) and the output is
    returned padded (pad rows carry only the residual).
    """
    b, n, e = x.shape
    if n_real is not None:
        npad = _choose_rows(n_real)
        if npad != n:
            raise ValueError(
                f"pad-once input rows {n} != kernel row multiple {npad} "
                f"for n_real={n_real}"
            )
        x_pad, n = x, n_real
    else:
        npad = _choose_rows(n)
        x_pad = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
    if rng is None or deterministic or dropout_rate == 0.0:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jax.random.randint(rng, (1,), 0, 2**31 - 1, dtype=jnp.int32)
    static_cfg = (
        float(dropout_rate), bool(deterministic), int(n), bool(fold_residual)
    )
    from v1t_tpu.parallel.kernel_sharding import call_kernel

    out = call_kernel(
        _mlp_core,
        static_cfg,
        (
            x_pad,
            gamma.reshape(1, e).astype(jnp.float32),
            beta.reshape(1, e).astype(jnp.float32),
            w1.astype(x.dtype), b1.reshape(1, -1).astype(jnp.float32),
            w2.astype(x.dtype), b2.reshape(1, e).astype(jnp.float32),
            seed,
        ),
        batched=(0,),
        seed_index=7,
    )
    return out if n_real is not None else out[:, :n, :]
