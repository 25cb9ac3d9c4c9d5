"""Fully-fused multi-head attention layer for the V1T core.

One Pallas kernel per direction computes the ENTIRE attention sublayer
(reference src/v1t/models/core/vit.py:205-284, everything between the pre-LN
and the residual add):

    qkv projection -> per-head split -> scale (learnable per-head under LSA)
    -> flash attention (online softmax, LSA diagonal mask, fused probability
    dropout) -> head concat -> output projection (+bias)

Fusing the projections into the kernel eliminates the head split/merge
transposes, the (B*H, Npad, Dpad) pad/slice copies and the dq/dk/dv concat
that the standalone flash kernel needed around it — profiled at ~57 ms of a
199 ms V1T train step at batch 64 (reshape 31 ms, pads 16 ms, concats 8 ms).
The kernel instead reads the pre-LN activations x once per (batch, head),
recomputes K/V = x @ Wk/Wv into VMEM scratch (0.6 ms of MXU work replaces
gigabytes of HBM layout traffic), and accumulates the per-head output
projections into the final (B, N, E) result in a VMEM accumulator.

Grid layout: (batch, head, q-block), head and q-block sequential.
- forward: K/V scratch computed at qi==0 and reused across q-blocks; the
  output block (b, qi) is revisited once per head — intermediate writebacks
  hold partial sums and the final head's pass (the chronologically last
  write) leaves the complete projection.
- backward: flash backward (recompute p from the stored LSE) + projection
  backward; dx accumulates in fp32 scratch and is written as ONE full-length
  block per batch (constant block index => a single writeback per b).
  Weight gradients are emitted as per-(b, h) partials and summed by XLA.

Padding: x is zero-padded to the q-block multiple OUTSIDE the kernel, and
the output is sliced back, so its cotangent is zero on pad rows; with a
bias-free qkv projection every pad contribution is exactly zero and only the
softmax key mask (+ LSA diagonal) is needed — no OOB garbage exists anywhere.
"""

from __future__ import annotations

import functools
import typing as t

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from v1t_tpu.ops.common import pallas_call as _pallas_call

from v1t_tpu.ops.flash_attention import (
    MASK_VALUE,
    _apply_keep_halves,
    _apply_mask,
    _dropout_keep_mask,
    _dropout_raw_bits,
    _keep_draw,
    _round_up,
)

BLOCK_Q = 256
BLOCK_K = 896
# exp2-softmax constants (dt2 kernels): log2(e) folds into the score scale
# so the softmax exp runs as the VPU-native exp2 without the x*log2e pass
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453
# whole-sequence mode: one q block and one k block per (batch, head) program.
# Only the lane-tile alignment (128) pads the token axis — for V1T's 1654
# tokens that is npad 1664 vs 1792 with 256-row blocks, i.e. 13.8% less work
# in every N^2 matmul — and the per-program grid overhead drops ~7x. The
# (npad, npad) fp32 score/probability temporaries must fit VMEM, hence the
# npad cap (tuned on v5e: 2048^2 fp32 = 16 MB per temporary).
WHOLE_SEQ_MAX = 2048

# k-block override captured once at import — see _choose_blocks
import os as _os  # noqa: E402

from v1t_tpu.ops.flash_attention import env_int as _env_int  # noqa: E402

_FUSED_BLOCK_K_OVERRIDE = _env_int("V1T_FUSED_BLOCK_K")

# dt-form (transposed-operand) whole-sequence kernels: the head dim D=155
# pads to 256 MXU lanes (1.65x the algorithmic MACs) whenever it is the
# contraction or the innermost output dim, but only to 160 sublanes (1.03x)
# when transposed. Measured per-matmul (v5e, slope method,
# misc/bench_dtform_matmul.py): pv lane-out 13.5 us vs out^T = v^T x p
# lane-lane 6.4; dk/dv sublane-aligned 13.9 vs transposed 4.5 (192 TF/s);
# dq 13.5 vs k^T-form 6.4. Read once at import so the traced kernel config
# cannot diverge from what save_args records within a process.
_raw_dt = _os.environ.get("V1T_DT_FORM", "2").strip().lower()
if _raw_dt in ("0", "false", "off", "no"):
    _DT_FORM = 0
elif _raw_dt in ("1", "true", "on", "yes"):
    _DT_FORM = 1
elif _raw_dt in ("2",):
    _DT_FORM = 2
else:
    # loud, like _use_dt_blocked: a typo must not silently run a kernel
    # config that save_args never recorded
    raise ValueError(
        f"V1T_DT_FORM={_raw_dt!r} not recognized; use 0/1/2 "
        "(or false/true aliases for 0/1)"
    )
# dt2 (default): transposed-SCORE orientation + batched all-head
# projections. Per (batch, head) the dt1 kernels issue 5-6 per-head
# projection matmuls (~10 us of a 43 us backward program at the flagship
# shapes — half-rate (E, D) shapes); dt2 computes ALL heads' transposed
# q/k/v (and do) projections in three (E, H*DP) matmuls at the first head
# pass into VMEM scratch and slices per head (DP = D rounded to 16 keeps
# every sublane slice aligned). With only transposed projections resident,
# the scores run as s^T = k^T-contract-q^T (sublane-padded D) and every
# downstream matmul stays in a sublane/lane-aligned form.


def _choose_blocks(n: int) -> t.Tuple[int, int, int]:
    """Returns (npad, block_q, block_k) for sequence length n.

    ``V1T_FUSED_BLOCK_K`` overrides the k-block size in whole-sequence mode
    (must divide npad; forward and backward share the tiling, keeping the
    regenerated dropout masks identical) — an experimentation knob for
    k-chunk pipelining measurements. Read ONCE at import (module constant
    _FUSED_BLOCK_K_OVERRIDE) so the traced kernel config cannot diverge from
    what save_args records in args.yaml within a process."""
    npad128 = _round_up(n, 128)
    if npad128 <= WHOLE_SEQ_MAX:
        bk = _FUSED_BLOCK_K_OVERRIDE
        if bk:
            # loud on invalid values: save_args records the env var as the
            # effective kernel config, so a silent fallback would put a
            # config that never ran into args.yaml
            if npad128 % bk != 0 or bk % 128 != 0:
                raise ValueError(
                    f"V1T_FUSED_BLOCK_K={bk} must be a 128-multiple "
                    f"divisor of npad={npad128}"
                )
            return npad128, npad128, bk
        return npad128, npad128, npad128
    npad = _round_up(n, BLOCK_Q)
    return npad, BLOCK_Q, (BLOCK_K if npad % BLOCK_K == 0 else BLOCK_Q)


# seed-space salt separating the folded output-dropout PRNG stream from the
# attention-probability dropout stream (whose uids are tiny linear indices)
_OUT_DROP_SALT = 1 << 24


def _out_keep_mask(seed, b, qi, nq, shape, keep_prob: float):
    """Deterministic keep mask for the folded output dropout of row block
    (b, qi) — regenerable in forward and backward."""
    pltpu.prng_seed(seed + _OUT_DROP_SALT + b * nq + qi)
    return _keep_draw(shape, keep_prob)


def _layernorm(x32, gamma, beta, eps=1e-5):  # torch nn.LayerNorm default
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * inv
    return xhat * gamma + beta, xhat, inv


def _mha_fwd_kernel(
    seed_ref,
    x_ref, brow_ref, g_ref, beta_ref, wqkv_ref, wp_ref, bp_ref, scale_ref,
    out_ref, *refs,
    n_real: int, num_heads: int, nq: int, nk: int, block_k: int,
    use_lsa: bool, dropout_rate: float, deterministic: bool,
    out_dropout: bool, fold_residual: bool, save_residuals: bool = True,
):
    if save_residuals:
        oh_ref, lse_ref, kv_scr, acc_scr, ln_scr = refs
    else:
        kv_scr, acc_scr, ln_scr = refs
    b, h, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    block_q = out_ref.shape[1]

    def _z(rows=None):
        # the sublayer input: x plus the folded per-batch bias row (the
        # behavior latent), added in the storage dtype so it is bit-equal
        # to the unfolded `x + b_latent[:, None, :]`
        x = x_ref[0] if rows is None else x_ref[0, rows, :]
        return x + brow_ref[0]

    @pl.when(jnp.logical_and(h == 0, qi == 0))
    def _compute_ln():
        ln, _, _ = _layernorm(
            _z().astype(jnp.float32), g_ref[0], beta_ref[0]
        )
        ln_scr[...] = ln.astype(ln_scr.dtype)

    @pl.when(qi == 0)
    def _compute_kv():
        kv_scr[0] = jax.lax.dot(
            ln_scr[...], wqkv_ref[1, h], preferred_element_type=jnp.float32
        ).astype(kv_scr.dtype)
        kv_scr[1] = jax.lax.dot(
            ln_scr[...], wqkv_ref[2, h], preferred_element_type=jnp.float32
        ).astype(kv_scr.dtype)

    scale = scale_ref[0, h]
    q = jax.lax.dot(
        ln_scr[pl.ds(qi * block_q, block_q), :], wqkv_ref[0, h],
        preferred_element_type=jnp.float32,
    ) * scale
    q = q.astype(ln_scr.dtype)

    bh = b * num_heads + h
    m = jnp.full((block_q, 1), MASK_VALUE, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, q.shape[1]), jnp.float32)
    for kj in range(nk):
        k = kv_scr[0, pl.ds(kj * block_k, block_k), :]
        v = kv_scr[1, pl.ds(kj * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = _apply_mask(s, qi, kj, n_real, use_lsa)
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l = alpha * l + jnp.sum(p, axis=1, keepdims=True)
        m = m_next
        if dropout_rate > 0.0 and not deterministic:
            keep = _dropout_keep_mask(
                seed_ref[0], bh, qi, kj, nq, nk, s.shape, 1.0 - dropout_rate
            )
            p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        acc = acc * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_h = (acc * l_inv).astype(out_ref.dtype)
    if save_residuals:
        oh_ref[0, 0] = o_h
        lse_val = m + jnp.log(jnp.maximum(l, 1e-37))
        lse_ref[0, 0] = jnp.broadcast_to(lse_val.T, (8, block_q))

    # accumulate this head's output projection; the full row block is
    # written back every head pass — the last head's writeback is final
    proj = jax.lax.dot(
        o_h, wp_ref[h], preferred_element_type=jnp.float32
    )
    row = pl.ds(qi * block_q, block_q)

    @pl.when(h == 0)
    def _init_acc():
        acc_scr[row, :] = proj + bp_ref[0][None, :].astype(jnp.float32)

    @pl.when(h > 0)
    def _add_acc():
        acc_scr[row, :] += proj

    # zero the padded query rows BEFORE the folded residual add: under
    # fold_residual with a bias_row, the emitted pad rows then carry only
    # the (tanh-bounded) behavior-latent rows accumulated across blocks —
    # not exact zeros, but bounded, masked as keys, and with exactly-zero
    # cotangents (the Transformer slices them off)
    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, out_ref.shape[-1]), 0)
        + qi * block_q
    )
    val = jnp.where(row_ids < n_real, acc_scr[row, :], 0.0)
    if out_dropout and dropout_rate > 0.0 and not deterministic:
        # folded output dropout (reference vit.py:229-232): the mask is
        # deterministic per (b, row block), so applying it on every head's
        # writeback leaves the final (last-head) value correct
        keep = _out_keep_mask(
            seed_ref[0], b, qi, nq, val.shape, 1.0 - dropout_rate
        )
        val = jnp.where(keep, val / (1.0 - dropout_rate), 0.0)
    out_val = val.astype(out_ref.dtype)
    if fold_residual:
        # emit dropout(proj(attention(ln(z)))) + z — the bf16 add matches
        # the XLA residual add's rounding (sum in fp32, one bf16 round)
        out_val = out_val + _z(pl.ds(qi * block_q, block_q))
    out_ref[0] = out_val


def _mha_fwd_kernel_dt(
    seed_ref,
    x_ref, brow_ref, g_ref, beta_ref, wqkv_ref, wp_ref, bp_ref, scale_ref,
    out_ref, *refs,
    n_real: int, num_heads: int,
    use_lsa: bool, dropout_rate: float, deterministic: bool,
    out_dropout: bool, fold_residual: bool, save_residuals: bool = True,
):
    """Whole-sequence forward in dt-form: v is held transposed (D, N) so the
    pv matmul contracts over the lane-aligned token axis instead of padding
    D 155->256 on lanes, and the output projection contracts D on sublanes.
    Softmax/dropout/LSA masks operate on p in the same (q, k) orientation as
    the legacy kernel — the regenerated masks are bit-identical."""
    if save_residuals:
        ohT_ref, lse_ref, acc_scr, ln_scr = refs
    else:
        acc_scr, ln_scr = refs
    b, h = pl.program_id(0), pl.program_id(1)
    npad = x_ref.shape[1]

    def _z():
        return x_ref[0] + brow_ref[0]

    @pl.when(h == 0)
    def _compute_ln():
        ln, _, _ = _layernorm(_z().astype(jnp.float32), g_ref[0], beta_ref[0])
        ln_scr[...] = ln.astype(ln_scr.dtype)

    ln = ln_scr[...]
    npad_rows = x_ref.shape[1]
    # draw the probability-dropout PRNG words BEFORE any MXU work (data-
    # independent); the threshold compare is applied inline in the select
    # pass below so no full-size i1 mask is ever materialized
    bits = None
    if dropout_rate > 0.0 and not deterministic:
        bh = b * num_heads + h
        bits = _dropout_raw_bits(
            seed_ref[0], bh, 0, 0, 1, 1, (npad_rows, npad_rows)
        )
    k = jax.lax.dot(
        ln, wqkv_ref[1, h], preferred_element_type=jnp.float32
    ).astype(ln.dtype)
    # v^T (D, N): contraction over E rides sublanes of Wv / lanes of ln
    vT = jax.lax.dot_general(
        wqkv_ref[2, h], ln, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(ln.dtype)
    scale = scale_ref[0, h]
    q = (
        jax.lax.dot(ln, wqkv_ref[0, h], preferred_element_type=jnp.float32)
        * scale
    ).astype(ln.dtype)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = _apply_mask(s, 0, 0, n_real, use_lsa)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    if bits is not None:
        (p,) = _apply_keep_halves(
            bits, (p,), 1.0 - dropout_rate, 1.0 / (1.0 - dropout_rate)
        )
    # out^T (D, N) = v^T x p^T: lane-lane contraction over the aligned key
    # axis — no transpose of p is needed, dims ((1,), (1,)) contract k
    outT = jax.lax.dot_general(
        vT, p.astype(vT.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    oT = (outT * l_inv.T).astype(out_ref.dtype)
    if save_residuals:
        ohT_ref[0, 0] = oT
        lse_val = m + jnp.log(jnp.maximum(l, 1e-37))
        lse_ref[0, 0] = jnp.broadcast_to(lse_val.T, (8, npad))

    # head output projection: contraction over D on sublanes (pad 160, not
    # 256) — accumulated across head passes as in the legacy kernel
    proj = jax.lax.dot_general(
        oT, wp_ref[h], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(h == 0)
    def _init_acc():
        acc_scr[...] = proj + bp_ref[0][None, :].astype(jnp.float32)

    @pl.when(h > 0)
    def _add_acc():
        acc_scr[...] += proj

    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, (npad, out_ref.shape[-1]), 0
    )
    val = jnp.where(row_ids < n_real, acc_scr[...], 0.0)
    if out_dropout and dropout_rate > 0.0 and not deterministic:
        keep = _out_keep_mask(seed_ref[0], b, 0, 1, val.shape,
                              1.0 - dropout_rate)
        val = jnp.where(keep, val / (1.0 - dropout_rate), 0.0)
    out_val = val.astype(out_ref.dtype)
    if fold_residual:
        out_val = out_val + _z()
    out_ref[0] = out_val


def _mha_bwd_kernel_dt(
    seed_ref,
    x_ref, brow_ref, g_ref, beta_ref, wqkv_ref, wp_ref, scale_ref, dout_ref,
    ohT_ref, lse_ref,
    dx_ref, dg_ref, dbeta_ref, dwqT_ref, dwkT_ref, dwvT_ref, dwp_ref,
    dscale_ref, dbp_ref, dbrow_ref,
    dx_scr, ln_scr, dbp_scr,
    *, n_real: int, num_heads: int,
    use_lsa: bool, dropout_rate: float, deterministic: bool,
    out_dropout: bool, fold_residual: bool,
):
    """Whole-sequence backward in dt-form. Every N^2 matmul whose output or
    contraction would put D on lanes runs transposed instead:
      dp  = do^T x v^T   (sublane contraction over D, pad 160)
      dq^T = k^T x ds    (lane-lane contraction over aligned keys)
      dk^T = q^T x ds    (lanes x sublanes over aligned queries)
      dv^T = do^T x p    (lanes x sublanes over aligned queries)
    Weight gradients are emitted transposed (D, E) and transposed back by
    XLA outside the kernel (155x155 — negligible)."""
    b, h = pl.program_id(0), pl.program_id(1)

    @pl.when(h == 0)
    def _init_per_batch():
        ln, _, _ = _layernorm(
            (x_ref[0] + brow_ref[0]).astype(jnp.float32),
            g_ref[0], beta_ref[0],
        )
        ln_scr[...] = ln.astype(ln_scr.dtype)
        dx_scr[...] = jnp.zeros_like(dx_scr)
        dbp_scr[...] = jnp.zeros_like(dbp_scr)

    ln = ln_scr[...]
    scale = scale_ref[0, h]
    k = jax.lax.dot(
        ln, wqkv_ref[1, h], preferred_element_type=jnp.float32
    ).astype(ln.dtype)
    kT = jax.lax.dot_general(
        wqkv_ref[1, h], ln, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(ln.dtype)
    vT = jax.lax.dot_general(
        wqkv_ref[2, h], ln, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(ln.dtype)
    qrawT = jax.lax.dot_general(
        wqkv_ref[0, h], ln, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, N) fp32
    qT = (qrawT * scale).astype(ln.dtype)
    q = (
        jax.lax.dot(ln, wqkv_ref[0, h], preferred_element_type=jnp.float32)
        * scale
    ).astype(ln.dtype)

    dout_raw = dout_ref[0]  # (N, E)
    dout = dout_raw
    if out_dropout and dropout_rate > 0.0 and not deterministic:
        keep = _out_keep_mask(seed_ref[0], b, 0, 1, dout.shape,
                              1.0 - dropout_rate)
        dout = jnp.where(
            keep, dout * jnp.asarray(1.0 / (1.0 - dropout_rate), dout.dtype),
            jnp.asarray(0.0, dout.dtype),
        )

    @pl.when(h == 0)
    def _acc_dbp():
        dbp_scr[...] += jnp.sum(
            dout.astype(jnp.float32), axis=0, keepdims=True
        )

    # do^T (D, N) = Wp_h x dout^T: lane-lane contraction over E
    doT = jax.lax.dot_general(
        wp_ref[h], dout, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    oT = ohT_ref[0, 0]  # (D, N)
    delta_row = jnp.sum(doT * oT.astype(jnp.float32), axis=0, keepdims=True)
    lse = lse_ref[0, 0][:1, :].T  # (N, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = _apply_mask(s, 0, 0, n_real, use_lsa)
    p = jnp.exp(s - lse)
    doT_b = doT.astype(ln.dtype)
    dp_raw = jax.lax.dot_general(
        doT_b, vT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, N): sublane contraction over D
    if dropout_rate > 0.0 and not deterministic:
        bh = b * num_heads + h
        bits = _dropout_raw_bits(seed_ref[0], bh, 0, 0, 1, 1, s.shape)
        p_dropped, dp = _apply_keep_halves(
            bits, (p, dp_raw), 1.0 - dropout_rate, 1.0 / (1.0 - dropout_rate)
        )
    else:
        p_dropped = p
        dp = dp_raw
    ds = (p * (dp - delta_row.T)).astype(ln.dtype)
    dqT = jax.lax.dot_general(
        kT, ds, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (D, N) over keys
    dkT = jax.lax.dot_general(
        qT, ds, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (D, N) over queries
    dvT = jax.lax.dot_general(
        doT_b, p_dropped.astype(ln.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, N) over queries

    dscale_ref[0, 0] = jnp.broadcast_to(jnp.sum(qrawT * dqT), (8, 128))
    dqrawT_b = (dqT * scale).astype(ln.dtype)
    dkT_b = dkT.astype(ln.dtype)
    dvT_b = dvT.astype(ln.dtype)
    # d(ln) contributions: contraction over D (sublanes of the transposed
    # gradients x lanes of the weights)
    dx_scr[...] += jax.lax.dot_general(
        dqrawT_b, wqkv_ref[0, h], (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_scr[...] += jax.lax.dot_general(
        dkT_b, wqkv_ref[1, h], (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_scr[...] += jax.lax.dot_general(
        dvT_b, wqkv_ref[2, h], (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # transposed weight gradients (D, E): contraction over the aligned
    # token axis
    dwqT_ref[0, 0] = jax.lax.dot_general(
        dqrawT_b, ln, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwkT_ref[0, 0] = jax.lax.dot_general(
        dkT_b, ln, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwvT_ref[0, 0] = jax.lax.dot_general(
        dvT_b, ln, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwp_ref[0, 0] = jax.lax.dot_general(
        oT, dout, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, E) over tokens

    @pl.when(h == num_heads - 1)
    def _write_dx():
        gamma = g_ref[0]
        _, xhat, inv = _layernorm(
            (x_ref[0] + brow_ref[0]).astype(jnp.float32),
            gamma, beta_ref[0],
        )
        dln = dx_scr[...]
        dg_ref[0] = jnp.sum(dln * xhat, axis=0, keepdims=True)
        dbeta_ref[0] = jnp.sum(dln, axis=0, keepdims=True)
        dbp_ref[0] = dbp_scr[...]
        dxhat = dln * gamma
        dx = inv * (
            dxhat
            - jnp.mean(dxhat, axis=-1, keepdims=True)
            - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        )
        if fold_residual:
            dx = dx + dout_raw.astype(jnp.float32)
        dbrow_ref[0] = jnp.sum(dx, axis=0, keepdims=True)
        dx_ref[0] = dx.astype(dx_ref.dtype)


def _apply_mask_t(sT, n_real: int, use_lsa: bool):
    """Transposed-orientation masking: keys ride the SUBLANE rows, so the
    pad-key mask is a (rows, 1) additive column; the LSA diagonal is
    orientation-invariant."""
    row = jax.lax.broadcasted_iota(jnp.int32, (sT.shape[0], 1), 0)
    sT = sT + jnp.where(row < n_real, 0.0, MASK_VALUE)
    if use_lsa:
        rows = jax.lax.broadcasted_iota(jnp.int32, sT.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, sT.shape, 1)
        sT = jnp.where(rows == cols, MASK_VALUE, sT)
    return sT


def _mha_fwd_kernel_dt2(
    seed_ref,
    x_ref, brow_ref, g_ref, beta_ref, wqkvp_ref, wpp_ref, bp_ref, scale_ref,
    out_ref, *refs,
    n_real: int, num_heads: int, dp: int,
    use_lsa: bool, dropout_rate: float, deterministic: bool,
    out_dropout: bool, fold_residual: bool, save_residuals: bool = True,
):
    """Whole-sequence forward, transposed-score orientation with batched
    projections. wqkvp is (3, E, H*DP) (per-head D zero-padded to DP) and
    wpp is (H*DP, E); at h==0 three matmuls fill the all-head transposed
    projection scratch (3, H*DP, N), each head pass slices its DP rows.
    Scores are computed transposed, s^T[k, q] = sum_d kT[d,k] qT[d,q]
    (D on sublanes of both operands: pad DP/D ~ 1.03 instead of the 1.65x
    lane pad of the (N,D)x(N,D) form); softmax reduces over the sublane
    (key) axis and the attention-output / projection matmuls keep the
    (DP, N) orientation of the dt1 kernels."""
    if save_residuals:
        ohT_ref, lse_ref, proj_scr, acc_scr, ln_scr = refs
    else:
        proj_scr, acc_scr, ln_scr = refs
    b, h = pl.program_id(0), pl.program_id(1)
    npad = x_ref.shape[1]

    def _z():
        return x_ref[0] + brow_ref[0]

    @pl.when(h == 0)
    def _compute_projections():
        ln, _, _ = _layernorm(_z().astype(jnp.float32), g_ref[0], beta_ref[0])
        ln_scr[...] = ln.astype(ln_scr.dtype)
        lnv = ln_scr[...]
        # ONE (E, 3*H*DP) matmul projects q/k/v for every head (wqkvp is
        # flattened over (qkv, head)); per-head slices stay 16-aligned
        proj_scr[...] = jax.lax.dot_general(
            wqkvp_ref[...], lnv, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(proj_scr.dtype)

    hp = num_heads * dp
    # log2(e) folds into the learned score scale so the softmax runs on the
    # VPU's native exp2 (saves the x*log2e pass inside exp, fwd AND bwd).
    # The backward's gradient lines are UNCHANGED: p is the same function of
    # (q_raw, scale) in any log base, and the base-2 softmax jacobian's ln2
    # cancels against the log2e in d(scores)/d(q_raw) and d/d(scale).
    scale = scale_ref[0, h] * LOG2E
    qrawT = proj_scr[pl.ds(h * dp, dp), :]  # (DP, N) bf16
    kT = proj_scr[pl.ds(hp + h * dp, dp), :]
    vT = proj_scr[pl.ds(2 * hp + h * dp, dp), :]
    qT = (qrawT.astype(jnp.float32) * scale).astype(kT.dtype)

    bits = None
    if dropout_rate > 0.0 and not deterministic:
        bh = b * num_heads + h
        bits = _dropout_raw_bits(seed_ref[0], bh, 0, 0, 1, 1, (npad, npad))

    sT = jax.lax.dot_general(
        kT, qT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (N_k, N_q) in log2 units
    sT = _apply_mask_t(sT, n_real, use_lsa)
    m = jnp.max(sT, axis=0, keepdims=True)   # (1, N_q)
    pT = jnp.exp2(sT - m)
    l = jnp.sum(pT, axis=0, keepdims=True)   # (1, N_q)
    if bits is not None:
        # select-only: the 1/keep_prob survivor scale folds into l_inv
        (pT,) = _apply_keep_halves(bits, (pT,), 1.0 - dropout_rate, 1.0)
    outT = jax.lax.dot_general(
        vT, pT.astype(vT.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (DP, N_q): contract keys (lanes of vT x sublanes of pT)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    if bits is not None:
        l_inv = l_inv * (1.0 / (1.0 - dropout_rate))
    oT = (outT * l_inv).astype(out_ref.dtype)
    if save_residuals:
        ohT_ref[0, 0] = oT
        # log2-domain lse: the backward recomputes pT = exp2(sT - lse)
        lse_val = m + jnp.log2(jnp.maximum(l, 1e-37))
        lse_ref[0, 0] = jnp.broadcast_to(lse_val, (8, npad))

    proj = jax.lax.dot_general(
        oT, wpp_ref[pl.ds(h * dp, dp), :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N_q, E)

    @pl.when(h == 0)
    def _init_acc():
        acc_scr[...] = proj + bp_ref[0][None, :].astype(jnp.float32)

    @pl.when(h > 0)
    def _add_acc():
        acc_scr[...] += proj

    @pl.when(h == num_heads - 1)
    def _writeback():
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (npad, out_ref.shape[-1]), 0
        )
        val = jnp.where(row_ids < n_real, acc_scr[...], 0.0)
        if out_dropout and dropout_rate > 0.0 and not deterministic:
            keep = _out_keep_mask(seed_ref[0], b, 0, 1, val.shape,
                                  1.0 - dropout_rate)
            val = jnp.where(keep, val / (1.0 - dropout_rate), 0.0)
        out_val = val.astype(out_ref.dtype)
        if fold_residual:
            out_val = out_val + _z()
        out_ref[0] = out_val


def _mha_bwd_kernel_dt2(
    seed_ref,
    x_ref, brow_ref, g_ref, beta_ref, wqkvp_ref, wqkv480_ref, wpp_ref,
    scale_ref, dout_ref, ohT_ref, lse_ref,
    dx_ref, dg_ref, dbeta_ref, dwqkvT_ref, dwp_ref,
    dscale_ref, dbp_ref, dbrow_ref,
    proj_scr, dot_scr, dout_scr, dx_scr, ln_scr, dbp_scr,
    *, n_real: int, num_heads: int, dp: int,
    use_lsa: bool, dropout_rate: float, deterministic: bool,
    out_dropout: bool, fold_residual: bool,
):
    """Whole-sequence backward, transposed-score orientation. Batched at
    h==0: the three all-head transposed projections AND the all-head
    do^T = Wp x dout^T (plus the out-dropout-masked cotangent and dbp).
    Per head only the five N^2 matmuls and four (DP, ...) gradient matmuls
    remain — the per-head (E, D) projection matmuls of the dt1 kernel
    (~10 us of its 43 us program) are amortized across heads."""
    b, h = pl.program_id(0), pl.program_id(1)
    npad = x_ref.shape[1]

    @pl.when(h == 0)
    def _init_per_batch():
        ln, _, _ = _layernorm(
            (x_ref[0] + brow_ref[0]).astype(jnp.float32),
            g_ref[0], beta_ref[0],
        )
        ln_scr[...] = ln.astype(ln_scr.dtype)
        dx_scr[...] = jnp.zeros_like(dx_scr)
        lnv = ln_scr[...]
        proj_scr[...] = jax.lax.dot_general(
            wqkvp_ref[...], lnv, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(proj_scr.dtype)
        dout = dout_ref[0]
        if out_dropout and dropout_rate > 0.0 and not deterministic:
            keep = _out_keep_mask(seed_ref[0], b, 0, 1, dout.shape,
                                  1.0 - dropout_rate)
            dout = jnp.where(
                keep,
                dout * jnp.asarray(1.0 / (1.0 - dropout_rate), dout.dtype),
                jnp.asarray(0.0, dout.dtype),
            )
        dout_scr[...] = dout
        dbp_scr[...] = jnp.sum(dout.astype(jnp.float32), axis=0,
                               keepdims=True)
        # do^T for ALL heads: (H*DP, N) = Wp_pad (H*DP, E) x dout^T
        dot_scr[...] = jax.lax.dot_general(
            wpp_ref[...], dout, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dot_scr.dtype)

    hp = num_heads * dp
    rows = pl.ds(h * dp, dp)
    # log2(e)-folded score scale: see the forward kernel. dsT below is the
    # NATURAL-log score gradient (the base-2 jacobian's ln2 cancels), so
    # every line contracting dsT against an UNSCALED operand is unchanged;
    # the two lines that consume the scaled qT (dkT) or the scale itself
    # (dy_q) use scale_nat / a ln2 correction.
    scale_nat = scale_ref[0, h]
    scale = scale_nat * LOG2E
    qrawT = proj_scr[pl.ds(h * dp, dp), :]
    kT = proj_scr[pl.ds(hp + h * dp, dp), :]
    vT = proj_scr[pl.ds(2 * hp + h * dp, dp), :]
    qT = (qrawT.astype(jnp.float32) * scale).astype(kT.dtype)
    doT = dot_scr[rows, :]  # (DP, N) bf16
    oT = ohT_ref[0, 0]      # (DP, N)

    bits = None
    inv_keep = 1.0
    if dropout_rate > 0.0 and not deterministic:
        bh = b * num_heads + h
        bits = _dropout_raw_bits(seed_ref[0], bh, 0, 0, 1, 1, (npad, npad))
        inv_keep = 1.0 / (1.0 - dropout_rate)

    delta_row = jnp.sum(
        doT.astype(jnp.float32) * oT.astype(jnp.float32),
        axis=0, keepdims=True,
    )  # (1, N_q)
    lse = lse_ref[0, 0][:1, :]  # (1, N_q), log2 domain

    sT = jax.lax.dot_general(
        kT, qT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    sT = _apply_mask_t(sT, n_real, use_lsa)
    pT = jnp.exp2(sT - lse)
    # the 1/keep_prob survivor scale folds into the SMALL (DP, N) operand
    # vT before the dpT matmul (and into dvT after its matmul) instead of
    # running as full (N, N) multiply passes inside the keep selects
    vT_dp = (
        (vT.astype(jnp.float32) * inv_keep).astype(vT.dtype)
        if bits is not None else vT
    )
    dpT_raw = jax.lax.dot_general(
        vT_dp, doT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N_k, N_q)
    if bits is not None:
        pT_dropped, dpT = _apply_keep_halves(
            bits, (pT, dpT_raw), 1.0 - dropout_rate, 1.0
        )
    else:
        pT_dropped = pT
        dpT = dpT_raw
    dsT = (pT * (dpT - delta_row)).astype(kT.dtype)

    dqT = jax.lax.dot_general(
        kT, dsT, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (DP, N_q): contract keys
    dkT = jax.lax.dot_general(
        qT, dsT, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (DP, N_k): contract queries
    dvT = jax.lax.dot_general(
        doT, pT_dropped.astype(kT.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (DP, N_k)
    if bits is not None:
        dvT = dvT * inv_keep

    dscale_ref[0, 0] = jnp.broadcast_to(
        jnp.sum(qrawT.astype(jnp.float32) * dqT), (8, 128)
    )
    # stack [dq_raw^T; dk^T; dv^T] (3*DP, N) once: ONE matmul then yields
    # all three transposed weight gradients and ONE matmul the d(ln)
    # contribution (wqkv480 is the per-head [Wq|Wk|Wv] (E, 3*DP) stack)
    dyT = jnp.concatenate(
        [
            (dqT * scale_nat).astype(kT.dtype),
            # dkT contracted the LOG2E-scaled qT: correct by ln2
            (dkT * LN2).astype(kT.dtype),
            dvT.astype(kT.dtype),
        ],
        axis=0,
    )
    ln = ln_scr[...]
    dx_scr[...] += jax.lax.dot_general(
        dyT, wqkv480_ref[0], (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwqkvT_ref[0, 0] = jax.lax.dot_general(
        dyT, ln, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (3*DP, E)
    dwp_ref[0, 0] = jax.lax.dot_general(
        oT, dout_scr[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (DP, E)

    @pl.when(h == num_heads - 1)
    def _write_dx():
        gamma = g_ref[0]
        _, xhat, inv = _layernorm(
            (x_ref[0] + brow_ref[0]).astype(jnp.float32),
            gamma, beta_ref[0],
        )
        dln = dx_scr[...]
        dg_ref[0] = jnp.sum(dln * xhat, axis=0, keepdims=True)
        dbeta_ref[0] = jnp.sum(dln, axis=0, keepdims=True)
        dbp_ref[0] = dbp_scr[...]
        dxhat = dln * gamma
        dx = inv * (
            dxhat
            - jnp.mean(dxhat, axis=-1, keepdims=True)
            - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        )
        if fold_residual:
            dx = dx + dout_ref[0].astype(jnp.float32)
        dbrow_ref[0] = jnp.sum(dx, axis=0, keepdims=True)
        dx_ref[0] = dx.astype(dx_ref.dtype)


def _dt2_weights(wqkv, wp, dp: int):
    """Pad per-head D to DP and lay the projection weights out for the dt2
    kernels: wqkvp (3, E, H*DP) for the batched transposed projections,
    wqkv160 (3, H, E, DP) for the in-kernel d(ln) matmuls, wpp (H*DP, E)
    for the batched do^T and the per-head output projection slices."""
    three, heads, e, d = wqkv.shape
    pad = dp - d
    wqkv_p = jnp.pad(wqkv, ((0, 0), (0, 0), (0, 0), (0, pad)))
    wqkvp = jnp.concatenate(
        [
            jnp.transpose(wqkv_p[t], (1, 0, 2)).reshape(e, heads * dp)
            for t in range(three)
        ],
        axis=1,
    )  # (E, 3*H*DP), blocks [q_all | k_all | v_all]
    # per-head stacked [Wq_h | Wk_h | Wv_h] (E, 3*DP) for the one-matmul
    # d(ln) contraction in the backward
    wqkv480 = jnp.concatenate(
        [wqkv_p[t] for t in range(three)], axis=-1
    )  # (H, E, 3*DP)
    wp_p = jnp.pad(wp, ((0, 0), (0, pad), (0, 0)))  # (H, DP, E)
    wpp = wp_p.reshape(heads * dp, e)
    return wqkvp, wqkv480, wpp


def _mha_forward_dt2(x_pad, brow, gamma, beta, wqkv, wp, bp, scale, seed, *,
                     cfg, save_residuals=True):
    b, npad, e = x_pad.shape
    d = wqkv.shape[-1]
    dp = _round_up(d, 16)
    h = cfg["num_heads"]
    wqkvp, _, wpp = _dt2_weights(wqkv, wp, dp)
    grid = (b, h)
    res_specs = [
        pl.BlockSpec((1, 1, dp, npad), lambda bi, hi, *_: (bi, hi, 0, 0)),
        pl.BlockSpec((1, 1, 8, npad), lambda bi, hi, *_: (bi, hi, 0, 0)),
    ]
    res_shapes = [
        jax.ShapeDtypeStruct((b, h, dp, npad), x_pad.dtype),
        jax.ShapeDtypeStruct((b, h, 8, npad), jnp.float32),
    ]
    if not save_residuals:
        res_specs, res_shapes = [], []
    results = _pallas_call(
        functools.partial(
            _mha_fwd_kernel_dt2, save_residuals=save_residuals, dp=dp,
            **_dt_cfg(cfg)
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, npad, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, e), lambda bi, hi, *_: (0, 0)),  # gamma
                pl.BlockSpec((1, e), lambda bi, hi, *_: (0, 0)),  # beta
                pl.BlockSpec((e, 3 * h * dp), lambda bi, hi, *_: (0, 0)),
                pl.BlockSpec((h * dp, e), lambda bi, hi, *_: (0, 0)),
                pl.BlockSpec((1, e), lambda bi, hi, *_: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, npad, e), lambda bi, hi, *_: (bi, 0, 0)),
            ] + res_specs,
            scratch_shapes=[
                pltpu.VMEM((3 * h * dp, npad), x_pad.dtype),  # qT/kT/vT
                pltpu.VMEM((npad, e), jnp.float32),          # projection accum
                pltpu.VMEM((npad, e), x_pad.dtype),          # layernorm(x)
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, e), x_pad.dtype),
        ] + res_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed, x_pad, brow, gamma, beta, wqkvp, wpp, bp, scale)
    if not save_residuals:
        return results[0], None, None
    return tuple(results)


def _mha_backward_dt2(x_pad, brow, gamma, beta, wqkv, wp, scale, seed, ohT,
                      lse, dout, *, cfg):
    b, npad, e = x_pad.shape
    d = wqkv.shape[-1]
    dp = _round_up(d, 16)
    h = cfg["num_heads"]
    wqkvp, wqkv480, wpp = _dt2_weights(wqkv, wp, dp)
    grid = (b, h)
    (dx, dg, dbeta, dwqkvT, dwp, dscale, dbp,
     dbrow) = _pallas_call(
        functools.partial(_mha_bwd_kernel_dt2, dp=dp, **_dt_cfg(cfg)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, npad, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, e), lambda bi, hi, *_: (0, 0)),  # gamma
                pl.BlockSpec((1, e), lambda bi, hi, *_: (0, 0)),  # beta
                pl.BlockSpec((e, 3 * h * dp), lambda bi, hi, *_: (0, 0)),
                pl.BlockSpec(
                    (1, e, 3 * dp), lambda bi, hi, *_: (hi, 0, 0)
                ),
                pl.BlockSpec((h * dp, e), lambda bi, hi, *_: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, npad, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec(
                    (1, 1, dp, npad), lambda bi, hi, *_: (bi, hi, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 8, npad), lambda bi, hi, *_: (bi, hi, 0, 0)
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, npad, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec(
                    (1, 1, 3 * dp, e), lambda bi, hi, *_: (bi, hi, 0, 0)
                ),
                pl.BlockSpec((1, 1, dp, e), lambda bi, hi, *_: (bi, hi, 0, 0)),
                pl.BlockSpec(
                    (1, 1, 8, 128), lambda bi, hi, *_: (bi, hi, 0, 0)
                ),
                pl.BlockSpec((1, 1, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, hi, *_: (bi, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((3 * h * dp, npad), x_pad.dtype),  # qT/kT/vT
                pltpu.VMEM((h * dp, npad), x_pad.dtype),     # do^T all heads
                pltpu.VMEM((npad, e), x_pad.dtype),          # masked dout
                pltpu.VMEM((npad, e), jnp.float32),          # d(ln) accum
                pltpu.VMEM((npad, e), x_pad.dtype),          # layernorm(x)
                pltpu.VMEM((1, e), jnp.float32),             # dbp
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, e), x_pad.dtype),
            jax.ShapeDtypeStruct((b, 1, e), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, e), jnp.float32),
            jax.ShapeDtypeStruct((b, h, 3 * dp, e), jnp.float32),
            jax.ShapeDtypeStruct((b, h, dp, e), jnp.float32),
            jax.ShapeDtypeStruct((b, h, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, e), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, e), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed, x_pad, brow, gamma, beta, wqkvp, wqkv480, wpp, scale, dout,
      ohT, lse)
    # split the stacked (3*DP, E) gradient back into q/k/v rows
    dwqT = dwqkvT[:, :, 0 * dp:0 * dp + dp, :]
    dwkT = dwqkvT[:, :, 1 * dp:1 * dp + dp, :]
    dwvT = dwqkvT[:, :, 2 * dp:2 * dp + dp, :]
    return dx, dg, dbeta, dwqT, dwkT, dwvT, dwp, dscale, dbp, dbrow


def _mha_bwd_kernel(
    seed_ref,
    x_ref, brow_ref, g_ref, beta_ref, wqkv_ref, wp_ref, scale_ref, dout_ref,
    oh_ref, lse_ref,
    dx_ref, dg_ref, dbeta_ref, dwq_ref, dwk_ref, dwv_ref, dwp_ref,
    dscale_ref, dbp_ref, dbrow_ref,
    kv_scr, dkv_scr, dx_scr, ln_scr, dwq_scr, dwk_scr, dwv_scr, dwp_scr,
    dscale_scr, dbp_scr,
    *, n_real: int, num_heads: int, nq: int, nk: int, block_k: int,
    use_lsa: bool, dropout_rate: float, deterministic: bool,
    out_dropout: bool, fold_residual: bool,
):
    b, h, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    block_q = dout_ref.shape[1]

    @pl.when(jnp.logical_and(h == 0, qi == 0))
    def _init_per_batch():
        ln, _, _ = _layernorm(
            (x_ref[0] + brow_ref[0]).astype(jnp.float32),
            g_ref[0], beta_ref[0],
        )
        ln_scr[...] = ln.astype(ln_scr.dtype)
        dx_scr[...] = jnp.zeros_like(dx_scr)
        dbp_scr[...] = jnp.zeros_like(dbp_scr)

    @pl.when(qi == 0)
    def _init_per_head():
        kv_scr[0] = jax.lax.dot(
            ln_scr[...], wqkv_ref[1, h], preferred_element_type=jnp.float32
        ).astype(kv_scr.dtype)
        kv_scr[1] = jax.lax.dot(
            ln_scr[...], wqkv_ref[2, h], preferred_element_type=jnp.float32
        ).astype(kv_scr.dtype)
        dkv_scr[...] = jnp.zeros_like(dkv_scr)
        dwq_scr[...] = jnp.zeros_like(dwq_scr)
        dwp_scr[...] = jnp.zeros_like(dwp_scr)
        dscale_scr[0] = 0.0

    scale = scale_ref[0, h]
    row = pl.ds(qi * block_q, block_q)
    qraw = jax.lax.dot(
        ln_scr[row, :], wqkv_ref[0, h], preferred_element_type=jnp.float32
    )
    q = (qraw * scale).astype(ln_scr.dtype)

    dout_raw = dout_ref[0]  # (block_q, E) bf16
    dout = dout_raw
    if out_dropout and dropout_rate > 0.0 and not deterministic:
        # undo the folded output dropout: mask + rescale the cotangent with
        # the regenerated forward mask before it reaches any gradient
        keep = _out_keep_mask(
            seed_ref[0], b, qi, nq, dout.shape, 1.0 - dropout_rate
        )
        dout = jnp.where(
            keep, dout * jnp.asarray(1.0 / (1.0 - dropout_rate), dout.dtype),
            jnp.asarray(0.0, dout.dtype),
        )

    # projection-bias gradient: sum of the (masked) cotangent rows; once per
    # (b, qi) — the cotangent is identical across head passes
    @pl.when(h == 0)
    def _acc_dbp():
        dbp_scr[...] += jnp.sum(
            dout.astype(jnp.float32), axis=0, keepdims=True
        )

    # do_h = dout @ Wp_h^T
    do = jax.lax.dot_general(
        dout, wp_ref[h], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, D) fp32
    o_h = oh_ref[0, 0]  # (block_q, D)
    delta = jnp.sum(do * o_h.astype(jnp.float32), axis=1, keepdims=True)
    lse = lse_ref[0, 0][:1, :].T  # (block_q, 1)

    bh = b * num_heads + h
    # bf16 operands for the N^2 matmuls (fp32 accumulation): an fp32 x fp32
    # MXU matmul decomposes into multiple bf16 passes
    do_b = do.astype(ln_scr.dtype)
    dq = jnp.zeros((block_q, q.shape[1]), jnp.float32)
    for kj in range(nk):
        ksl = pl.ds(kj * block_k, block_k)
        k = kv_scr[0, ksl, :]
        v = kv_scr[1, ksl, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = _apply_mask(s, qi, kj, n_real, use_lsa)
        p = jnp.exp(s - lse)
        dp_raw = jax.lax.dot_general(
            do_b, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_rate > 0.0 and not deterministic:
            keep = _dropout_keep_mask(
                seed_ref[0], bh, qi, kj, nq, nk, s.shape, 1.0 - dropout_rate
            )
            inv_keep = 1.0 / (1.0 - dropout_rate)
            p_dropped = jnp.where(keep, p * inv_keep, 0.0)
            dp = jnp.where(keep, dp_raw * inv_keep, 0.0)
        else:
            p_dropped = p
            dp = dp_raw
        ds = p * (dp - delta)
        dq += jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )
        dkv_scr[0, ksl, :] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dkv_scr[1, ksl, :] += jax.lax.dot_general(
            p_dropped.astype(ln_scr.dtype), do_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # scale/projection backward for this q-block
    dqraw = dq * scale
    dscale_scr[0] += jnp.sum(qraw * dq)
    xq = ln_scr[row, :]
    dqraw_lp = dqraw.astype(ln_scr.dtype)
    dx_scr[row, :] += jax.lax.dot_general(
        dqraw_lp, wqkv_ref[0, h], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwq_scr[...] += jax.lax.dot_general(
        xq, dqraw_lp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwp_scr[...] += jax.lax.dot_general(
        o_h, dout, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == nq - 1)
    def _finish_head():
        dk = dkv_scr[0].astype(ln_scr.dtype)
        dv = dkv_scr[1].astype(ln_scr.dtype)
        dx_scr[...] += jax.lax.dot_general(
            dk, wqkv_ref[1, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx_scr[...] += jax.lax.dot_general(
            dv, wqkv_ref[2, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwk_scr[...] = jax.lax.dot_general(
            ln_scr[...], dk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwv_scr[...] = jax.lax.dot_general(
            ln_scr[...], dv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwq_ref[0, 0] = dwq_scr[...]
        dwk_ref[0, 0] = dwk_scr[...]
        dwv_ref[0, 0] = dwv_scr[...]
        dwp_ref[0, 0] = dwp_scr[...]
        dscale_ref[0, 0] = jnp.broadcast_to(dscale_scr[0], (8, 128))

    @pl.when(jnp.logical_and(h == num_heads - 1, qi == nq - 1))
    def _write_dx():
        # dx_scr holds d(ln); apply the LayerNorm backward over the full
        # batch row-band and emit dgamma/dbeta partials. The LN input is
        # z = x + bias_row; d/dx == d/dz, and the bias-row gradient is the
        # row sum of dz.
        gamma = g_ref[0]
        _, xhat, inv = _layernorm(
            (x_ref[0] + brow_ref[0]).astype(jnp.float32),
            gamma, beta_ref[0],
        )
        dln = dx_scr[...]
        dg_ref[0] = jnp.sum(dln * xhat, axis=0, keepdims=True)
        dbeta_ref[0] = jnp.sum(dln, axis=0, keepdims=True)
        dbp_ref[0] = dbp_scr[...]
        dxhat = dln * gamma
        dx = inv * (
            dxhat
            - jnp.mean(dxhat, axis=-1, keepdims=True)
            - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        )
        if fold_residual:
            # residual branch: the RAW (pre output-dropout-mask) cotangent
            # flows straight through the y = f(z) + z skip. Whole-sequence
            # mode only (nq == 1): this program's dout block is the band.
            dx = dx + dout_raw.astype(jnp.float32)
        dbrow_ref[0] = jnp.sum(dx, axis=0, keepdims=True)
        dx_ref[0] = dx.astype(dx_ref.dtype)


def _pack_static(n_real, num_heads, nq, nk, block_k, use_lsa, dropout_rate,
                 deterministic, out_dropout, fold_residual, dt=False):
    return dict(
        n_real=n_real, num_heads=num_heads, nq=nq, nk=nk, block_k=block_k,
        use_lsa=use_lsa, dropout_rate=dropout_rate,
        deterministic=deterministic, out_dropout=out_dropout,
        fold_residual=fold_residual, dt=dt,
    )


def _dt_cfg(cfg):
    """cfg subset the dt kernels take (whole-sequence: no block tiling)."""
    return {
        k: v for k, v in cfg.items() if k not in ("nq", "nk", "block_k", "dt")
    }


def _legacy_cfg(cfg):
    return {k: v for k, v in cfg.items() if k != "dt"}


def _mha_forward_dt(x_pad, brow, gamma, beta, wqkv, wp, bp, scale, seed, *,
                    cfg, save_residuals=True):
    b, npad, e = x_pad.shape
    d = wqkv.shape[-1]
    h = cfg["num_heads"]
    grid = (b, h)
    res_specs = [
        pl.BlockSpec((1, 1, d, npad), lambda bi, hi, *_: (bi, hi, 0, 0)),
        pl.BlockSpec((1, 1, 8, npad), lambda bi, hi, *_: (bi, hi, 0, 0)),
    ]
    res_shapes = [
        jax.ShapeDtypeStruct((b, h, d, npad), x_pad.dtype),
        jax.ShapeDtypeStruct((b, h, 8, npad), jnp.float32),
    ]
    if not save_residuals:
        res_specs, res_shapes = [], []
    results = _pallas_call(
        functools.partial(
            _mha_fwd_kernel_dt, save_residuals=save_residuals, **_dt_cfg(cfg)
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, npad, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, e), lambda bi, hi, *_: (0, 0)),  # gamma
                pl.BlockSpec((1, e), lambda bi, hi, *_: (0, 0)),  # beta
                pl.BlockSpec((3, h, e, d), lambda bi, hi, *_: (0, 0, 0, 0)),
                pl.BlockSpec((h, d, e), lambda bi, hi, *_: (0, 0, 0)),
                pl.BlockSpec((1, e), lambda bi, hi, *_: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, npad, e), lambda bi, hi, *_: (bi, 0, 0)),
            ] + res_specs,
            scratch_shapes=[
                pltpu.VMEM((npad, e), jnp.float32),   # projection accum
                pltpu.VMEM((npad, e), x_pad.dtype),   # layernorm(x)
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, e), x_pad.dtype),
        ] + res_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed, x_pad, brow, gamma, beta, wqkv, wp, bp, scale)
    if not save_residuals:
        return results[0], None, None
    return tuple(results)


def _mha_backward_dt(x_pad, brow, gamma, beta, wqkv, wp, scale, seed, ohT,
                     lse, dout, *, cfg):
    b, npad, e = x_pad.shape
    d = wqkv.shape[-1]
    h = cfg["num_heads"]
    grid = (b, h)
    (dx, dg, dbeta, dwqT, dwkT, dwvT, dwp, dscale, dbp,
     dbrow) = _pallas_call(
        functools.partial(_mha_bwd_kernel_dt, **_dt_cfg(cfg)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, npad, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, e), lambda bi, hi, *_: (0, 0)),  # gamma
                pl.BlockSpec((1, e), lambda bi, hi, *_: (0, 0)),  # beta
                pl.BlockSpec((3, h, e, d), lambda bi, hi, *_: (0, 0, 0, 0)),
                pl.BlockSpec((h, d, e), lambda bi, hi, *_: (0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, npad, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec(
                    (1, 1, d, npad), lambda bi, hi, *_: (bi, hi, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 8, npad), lambda bi, hi, *_: (bi, hi, 0, 0)
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, npad, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, d, e), lambda bi, hi, *_: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, d, e), lambda bi, hi, *_: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, d, e), lambda bi, hi, *_: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, d, e), lambda bi, hi, *_: (bi, hi, 0, 0)),
                pl.BlockSpec(
                    (1, 1, 8, 128), lambda bi, hi, *_: (bi, hi, 0, 0)
                ),
                pl.BlockSpec((1, 1, e), lambda bi, hi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, hi, *_: (bi, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((npad, e), jnp.float32),   # d(ln) accumulator
                pltpu.VMEM((npad, e), x_pad.dtype),   # layernorm(x)
                pltpu.VMEM((1, e), jnp.float32),      # dbp
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, e), x_pad.dtype),
            jax.ShapeDtypeStruct((b, 1, e), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, e), jnp.float32),
            jax.ShapeDtypeStruct((b, h, d, e), jnp.float32),
            jax.ShapeDtypeStruct((b, h, d, e), jnp.float32),
            jax.ShapeDtypeStruct((b, h, d, e), jnp.float32),
            jax.ShapeDtypeStruct((b, h, d, e), jnp.float32),
            jax.ShapeDtypeStruct((b, h, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, e), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, e), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed, x_pad, brow, gamma, beta, wqkv, wp, scale, dout, ohT, lse)
    return dx, dg, dbeta, dwqT, dwkT, dwvT, dwp, dscale, dbp, dbrow


def _mha_forward(x_pad, brow, gamma, beta, wqkv, wp, bp, scale, seed, *, cfg,
                 save_residuals=True):
    b, npad, e = x_pad.shape
    d = wqkv.shape[-1]
    h = cfg["num_heads"]
    nq = cfg["nq"]
    bq = npad // nq
    grid = (b, h, nq)
    res_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi, *_: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, 8, bq), lambda bi, hi, qi, *_: (bi, hi, 0, qi)),
    ]
    res_shapes = [
        jax.ShapeDtypeStruct((b, h, npad, d), x_pad.dtype),
        jax.ShapeDtypeStruct((b, h, 8, npad), jnp.float32),
    ]
    if not save_residuals:
        res_specs, res_shapes = [], []
    results = _pallas_call(
        functools.partial(
            _mha_fwd_kernel, save_residuals=save_residuals,
            **_legacy_cfg(cfg)
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, npad, e), lambda bi, hi, qi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, hi, qi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, e), lambda bi, hi, qi, *_: (0, 0)),  # gamma
                pl.BlockSpec((1, e), lambda bi, hi, qi, *_: (0, 0)),  # beta
                pl.BlockSpec((3, h, e, d), lambda bi, hi, qi, *_: (0, 0, 0, 0)),
                pl.BlockSpec((h, d, e), lambda bi, hi, qi, *_: (0, 0, 0)),
                pl.BlockSpec((1, e), lambda bi, hi, qi, *_: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, e), lambda bi, hi, qi, *_: (bi, qi, 0)),
            ] + res_specs,
            scratch_shapes=[
                pltpu.VMEM((2, npad, d), x_pad.dtype),
                pltpu.VMEM((npad, e), jnp.float32),
                pltpu.VMEM((npad, e), x_pad.dtype),   # layernorm(x)
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, e), x_pad.dtype),
        ] + res_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # whole-sequence mode holds (npad, npad) fp32 score/probability
            # temporaries in VMEM — past the default 16 MB scoped budget
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed, x_pad, brow, gamma, beta, wqkv, wp, bp, scale)
    if not save_residuals:
        return results[0], None, None
    return tuple(results)


def _mha_backward(x_pad, brow, gamma, beta, wqkv, wp, scale, seed, oh, lse,
                  dout, *, cfg):
    b, npad, e = x_pad.shape
    d = wqkv.shape[-1]
    h = cfg["num_heads"]
    nq = cfg["nq"]
    bq = npad // nq
    grid = (b, h, nq)
    dx, dg, dbeta, dwq, dwk, dwv, dwp, dscale, dbp, dbrow = _pallas_call(
        functools.partial(_mha_bwd_kernel, **_legacy_cfg(cfg)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, npad, e), lambda bi, hi, qi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, hi, qi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, e), lambda bi, hi, qi, *_: (0, 0)),  # gamma
                pl.BlockSpec((1, e), lambda bi, hi, qi, *_: (0, 0)),  # beta
                pl.BlockSpec((3, h, e, d), lambda bi, hi, qi, *_: (0, 0, 0, 0)),
                pl.BlockSpec((h, d, e), lambda bi, hi, qi, *_: (0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, bq, e), lambda bi, hi, qi, *_: (bi, qi, 0)),
                pl.BlockSpec(
                    (1, 1, bq, d), lambda bi, hi, qi, *_: (bi, hi, qi, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 8, bq), lambda bi, hi, qi, *_: (bi, hi, 0, qi)
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, npad, e), lambda bi, hi, qi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, hi, qi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, hi, qi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e, d), lambda bi, hi, qi, *_: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, e, d), lambda bi, hi, qi, *_: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, e, d), lambda bi, hi, qi, *_: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, d, e), lambda bi, hi, qi, *_: (bi, hi, 0, 0)),
                pl.BlockSpec(
                    (1, 1, 8, 128), lambda bi, hi, qi, *_: (bi, hi, 0, 0)
                ),
                pl.BlockSpec((1, 1, e), lambda bi, hi, qi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, e), lambda bi, hi, qi, *_: (bi, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, npad, d), x_pad.dtype),     # k, v
                pltpu.VMEM((2, npad, d), jnp.float32),     # dk, dv
                pltpu.VMEM((npad, e), jnp.float32),        # d(ln) accumulator
                pltpu.VMEM((npad, e), x_pad.dtype),        # layernorm(x)
                pltpu.VMEM((e, d), jnp.float32),           # dwq
                pltpu.VMEM((e, d), jnp.float32),           # dwk
                pltpu.VMEM((e, d), jnp.float32),           # dwv
                pltpu.VMEM((d, e), jnp.float32),           # dwp
                pltpu.SMEM((1,), jnp.float32),             # dscale
                pltpu.VMEM((1, e), jnp.float32),           # dbp
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, e), x_pad.dtype),
            jax.ShapeDtypeStruct((b, 1, e), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, e), jnp.float32),
            jax.ShapeDtypeStruct((b, h, e, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, e, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, e, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, d, e), jnp.float32),
            jax.ShapeDtypeStruct((b, h, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, e), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, e), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # the dk/dv + d(ln) fp32 accumulators put the backward slightly
            # over the default 16 MB scoped-vmem budget; v5e has headroom
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed, x_pad, brow, gamma, beta, wqkv, wp, scale, dout, oh, lse)
    return dx, dg, dbeta, dwq, dwk, dwv, dwp, dscale, dbp, dbrow


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mha_core(static_cfg, x_pad, brow, gamma, beta, wqkv, wp, bp, scale, seed):
    # primal (not-being-differentiated) path — eval/serving: skip the
    # per-head output + LSE residual writebacks entirely (132 MB/block at
    # the flagship shapes)
    cfg = _pack_static(*static_cfg)
    fwd = {0: _mha_forward, 1: _mha_forward_dt, 2: _mha_forward_dt2}[
        cfg["dt"]]
    out, _, _ = fwd(
        x_pad, brow, gamma, beta, wqkv, wp, bp, scale, seed, cfg=cfg,
        save_residuals=False,
    )
    return out


def _mha_core_fwd(static_cfg, x_pad, brow, gamma, beta, wqkv, wp, bp, scale,
                  seed):
    cfg = _pack_static(*static_cfg)
    fwd = {0: _mha_forward, 1: _mha_forward_dt, 2: _mha_forward_dt2}[
        cfg["dt"]]
    out, oh, lse = fwd(
        x_pad, brow, gamma, beta, wqkv, wp, bp, scale, seed, cfg=cfg
    )
    return out, (x_pad, brow, gamma, beta, wqkv, wp, scale, seed, oh, lse)


def _mha_core_bwd(static_cfg, residuals, dout):
    cfg = _pack_static(*static_cfg)
    x_pad, brow, gamma, beta, wqkv, wp, scale, seed, oh, lse = residuals
    bwd = {0: _mha_backward, 1: _mha_backward_dt, 2: _mha_backward_dt2}[
        cfg["dt"]]
    dx, dg, dbeta, dwq, dwk, dwv, dwp, dscale, dbp_p, dbrow = bwd(
        x_pad, brow, gamma, beta, wqkv, wp, scale, seed, oh, lse,
        dout.astype(x_pad.dtype), cfg=cfg,
    )
    if cfg["dt"] == 2:
        # dt2 emits (DP, .) rows padded to the 16-sublane multiple
        d = wqkv.shape[-1]
        dwq, dwk, dwv = (y[:, :, :d, :] for y in (dwq, dwk, dwv))
        dwp = dwp[:, :, :d, :]
    if cfg["dt"]:
        # dt kernels emit per-(b, h) weight gradients transposed (D, E)
        dwq = jnp.swapaxes(dwq, -1, -2)
        dwk = jnp.swapaxes(dwk, -1, -2)
        dwv = jnp.swapaxes(dwv, -1, -2)
    dwqkv = jnp.stack(
        [jnp.sum(dwq, axis=0), jnp.sum(dwk, axis=0), jnp.sum(dwv, axis=0)],
        axis=0,
    )  # (3, H, E, D)
    dwp_total = jnp.sum(dwp, axis=0)  # (H, D, E)
    # in-kernel partials: the folded output dropout must mask the cotangent
    # before the bias gradient sees it
    dbp = jnp.sum(dbp_p, axis=0)  # (1, E)
    dscale_total = jnp.sum(dscale[:, :, 0, 0], axis=0)[None]  # (1, H)
    return (
        dx,
        dbrow.astype(brow.dtype),
        jnp.sum(dg, axis=0),
        jnp.sum(dbeta, axis=0),
        dwqkv.astype(x_pad.dtype),
        dwp_total.astype(x_pad.dtype),
        dbp.astype(x_pad.dtype),
        dscale_total,
        None,
    )


_mha_core.defvjp(_mha_core_fwd, _mha_core_bwd)


def fused_mha(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    wqkv: jax.Array,
    wp: jax.Array,
    bp: jax.Array,
    scale: jax.Array,
    *,
    use_lsa: bool = False,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    rng: t.Optional[jax.Array] = None,
    n_real: t.Optional[int] = None,
    fold_out_dropout: bool = False,
    fold_residual: bool = False,
    bias_row: t.Optional[jax.Array] = None,
) -> jax.Array:
    """The full pre-LN attention sublayer as one fused kernel.

    Args:
        x: (B, N, E) residual-stream activations (LayerNorm is IN-kernel).
        gamma/beta: (E,) LayerNorm affine parameters.
        wqkv: (3, H, E, D) query/key/value projection weights (bias-free,
            reference vit.py:222-224).
        wp: (H, D, E) output projection weights (per-head slices of the
            reference's (H*D, E) Linear).
        bp: (E,) output projection bias.
        scale: (H,) per-head scale — learnable under LSA (vit.py:236-239),
            constant emb^-0.5 otherwise.
        n_real: pad-once mode — x is ALREADY padded to the kernel's row
            multiple with zero rows, only the first n_real tokens are real,
            and the output is returned padded (pad rows exactly zero). The
            caller pads once for the whole transformer instead of per
            sublayer.
        fold_out_dropout: apply the sublayer's output dropout
            (reference vit.py:229-232) inside the kernel — the caller must
            then NOT apply its own dropout to the result.
        fold_residual: emit ``sublayer(x) + x`` (and route the skip
            cotangent in the backward) — the caller must then NOT add the
            residual. Requires whole-sequence mode (one q block).
        bias_row: (B, E) per-batch row added to every token of x IN-KERNEL
            (the per-block behavior latent, reference vit.py:356-359) — the
            sublayer input becomes z = x + bias_row[:, None, :] and, under
            ``fold_residual``, the residual emitted is z. Gradient = row
            sum of dz.
    Returns:
        (B, N, E): projection(concat_heads(attention(layernorm(x)))) + bias.
    """
    b, n, e = x.shape
    _, num_heads, _, d = wqkv.shape
    if n_real is not None:
        npad, block_q, block_k = _choose_blocks(n_real)
        if npad != n:
            raise ValueError(
                f"pad-once input rows {n} != kernel row multiple {npad} "
                f"for n_real={n_real}"
            )
        x_pad, n = x, n_real
    else:
        npad, block_q, block_k = _choose_blocks(n)
        x_pad = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
    nq, nk = npad // block_q, npad // block_k
    if rng is None or deterministic or dropout_rate == 0.0:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jax.random.randint(rng, (1,), 0, 2**31 - 1, dtype=jnp.int32)

    if fold_residual and nq != 1:
        raise ValueError(
            "fold_residual requires whole-sequence mode (one q block); "
            f"got nq={nq} for n={n}"
        )
    static_cfg = (
        n, int(num_heads), nq, nk, block_k, bool(use_lsa),
        float(dropout_rate), bool(deterministic), bool(fold_out_dropout),
        bool(fold_residual),
        (_DT_FORM if (nq == 1 and nk == 1) else 0),
    )
    scale = jnp.broadcast_to(
        jnp.asarray(scale, jnp.float32).reshape(-1), (num_heads,)
    )
    if bias_row is None:
        brow = jnp.zeros((b, 1, e), x_pad.dtype)
    else:
        brow = bias_row.reshape(b, 1, e).astype(x_pad.dtype)
    from v1t_tpu.parallel.kernel_sharding import call_kernel

    out = call_kernel(
        _mha_core,
        static_cfg,
        (
            x_pad, brow,
            gamma.reshape(1, e).astype(jnp.float32),
            beta.reshape(1, e).astype(jnp.float32),
            wqkv, wp, bp.reshape(1, e), scale[None], seed,
        ),
        batched=(0, 1),
        seed_index=8,
    )
    return out if n_real is not None else out[:, :n, :]
