"""Blockwise flash-attention Pallas kernel for the V1T core.

Replaces the reference's materialized (1654, 1654) attention matrix + AMP +
per-attention gradient checkpointing (reference src/v1t/models/core/vit.py:
253-284) with an O(N)-memory fused kernel:

- online softmax over key blocks (running max/sum in fp32 VMEM scratch),
- fp32 accumulation with ``preferred_element_type`` on every MXU matmul,
- LSA support (per-head temperature folded into Q outside the kernel; the
  diagonal mask applied inside, reference vit.py:256-261),
- fused attention-probability dropout (reference vit.py:262-263): the 0/1
  keep mask is regenerated from a per-(batch*head, q-block, k-block) seed in
  both the forward and backward kernels, so nothing is stored,
- custom VJP with separate dQ and dK/dV kernels (flash backward: recompute
  p = exp(s - lse) blockwise; delta = rowsum(dO * O) precomputed once).

Key padding is masked to -0.7*float32.max (not -inf, avoiding exp(-inf-(-inf))
NaNs); query padding rows compute garbage that the wrapper slices off.
"""

from __future__ import annotations

import functools
import typing as t

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from v1t_tpu.ops.common import pallas_call as _pallas_call

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
import os as _os

NUM_LANES = 128
# exp2-softmax constants: log2(e) folds into the score scale so softmax
# runs on the VPU-native exp2; the base-2 jacobian's ln2 is folded once
# into ds in the backward kernels (see _dq_kernel_dt)
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


def env_int(name: str) -> int:
    """Integer env knob: empty/whitespace counts as unset (0); anything
    else must parse, with a clear message naming the variable (these are
    read at import so a bad value would otherwise kill every entry point
    with a bare int() traceback)."""
    raw = _os.environ.get(name, "").strip()
    if not raw:
        return 0
    try:
        return int(raw)
    except ValueError:
        raise ValueError(
            f"{name}={raw!r} must be an integer (or empty to mean unset)"
        ) from None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pick_blocks(n: int) -> t.Tuple[int, int]:
    """Block sizes for sequence length n. Both must be 128-aligned (k blocks
    are the scores tile's lane dim; q blocks are the LSE rows' lane dim).
    Tuned on v5e for the V1T shape (N=1654, D=155): large K blocks minimize
    grid-program overhead while the fp32 dk/dv scratch stays within VMEM —
    (256, 896) runs the training config 23% faster than (256, 256).
    Env overrides: V1T_FLASH_BLOCK_Q / V1T_FLASH_BLOCK_K."""
    n128 = _round_up(n, 128)
    block_q = env_int("V1T_FLASH_BLOCK_Q") or min(256, n128)
    block_k = env_int("V1T_FLASH_BLOCK_K") or min(896, n128)
    return block_q, block_k


def _keep_draw(shape, keep_prob: float):
    """Draw an i.i.d. keep mask of ``shape`` from the already-seeded
    hardware PRNG using 16-bit thresholds.

    The PRNG emits 32-bit words at a fixed words/cycle rate, and mask
    generation is the single largest VPU cost of fused dropout (measured
    ~5 ms of a 89 ms B=64 train step with full-size 32-bit draws). Each
    32-bit word yields two independent 16-bit draws, unpacked with
    shift/mask so the i1 result keeps a 32-bit layout (Mosaic cannot
    relayout a 16-bit-packed mask into an fp32 select); the keep
    probability quantizes to 1/65536 (≤ 2e-5 absolute — e.g. the V1T
    t_dropout 0.2544 keep rate lands at 0.745575 vs 0.7456 exact).
    8-bit draws (4 per word, dithered threshold) were measured a WASH:
    the extra unpack ALU eats the halved PRNG time. The sublane dim must
    be even (all kernel tiles are 128-aligned): a silent 32-bit fallback
    would be a DIFFERENT stream/quantization, and a forward/backward pair
    that disagreed on row parity would regenerate divergent masks and
    corrupt gradients with no error."""
    if shape[0] % 2 != 0:
        raise ValueError(
            f"_keep_draw requires an even sublane dim, got shape {shape}; "
            "pad the tile (fwd and bwd must pass bit-identical shapes)"
        )
    half = pltpu.bitcast(
        pltpu.prng_random_bits((shape[0] // 2, shape[1])), jnp.uint32
    )
    threshold = jnp.uint32(min(round(keep_prob * 65536.0), 65535))
    lo = jax.lax.bitwise_and(half, jnp.uint32(0xFFFF)) < threshold
    hi = jax.lax.shift_right_logical(half, jnp.uint32(16)) < threshold
    return jnp.concatenate([lo, hi], axis=0)


def _dropout_keep_mask(seed_base, bh, qi, kj, nq, nk, shape, keep_prob: float):
    """Deterministic per-(bh, q-block, k-block) keep mask, regenerable in
    forward and backward kernels."""
    pltpu.prng_seed(seed_base + (bh * nq + qi) * nk + kj)
    return _keep_draw(shape, keep_prob)


def _dropout_raw_bits(seed_base, bh, qi, kj, nq, nk, shape):
    """The RAW 32-bit PRNG words behind ``_dropout_keep_mask`` — one word
    per TWO mask rows. Callers apply the threshold inline via
    ``_apply_keep_halves`` so the unpacked i1 masks (stored as 32-bit
    vectors, a full (rows, cols) extra buffer) are never materialized:
    the compares fuse into the consuming select pass. The element mapping
    is bit-identical to ``_dropout_keep_mask``: low half-words mask rows
    [0, rows/2), high half-words rows [rows/2, rows)."""
    if shape[0] % 2 != 0:
        raise ValueError(
            f"_dropout_raw_bits requires an even sublane dim, got {shape}"
        )
    pltpu.prng_seed(seed_base + (bh * nq + qi) * nk + kj)
    return pltpu.bitcast(
        pltpu.prng_random_bits((shape[0] // 2, shape[1])), jnp.uint32
    )


def _threshold16(keep_prob: float):
    return jnp.uint32(min(round(keep_prob * 65536.0), 65535))


def _apply_keep_halves(bits, arrs, keep_prob: float, inv_scale: float):
    """where(keep, arr * inv_scale, 0) for each arr, with the keep mask
    decoded inline from ``bits`` (see _dropout_raw_bits) on the two row
    halves — mask-equivalent to ``jnp.where(_keep_draw(...), a*s, 0)``."""
    thr = _threshold16(keep_prob)
    lo = jax.lax.bitwise_and(bits, jnp.uint32(0xFFFF)) < thr
    hi = jax.lax.shift_right_logical(bits, jnp.uint32(16)) < thr
    half = arrs[0].shape[0] // 2
    outs = []
    for a in arrs:
        zero = jnp.asarray(0.0, a.dtype)
        if inv_scale == 1.0:
            # select-only: callers that fold the 1/keep_prob scale into a
            # smaller downstream operand skip this full-size multiply pass
            top, bot = a[:half], a[half:]
        else:
            scale = jnp.asarray(inv_scale, a.dtype)
            top, bot = a[:half] * scale, a[half:] * scale
        outs.append(
            jnp.concatenate(
                [jnp.where(lo, top, zero), jnp.where(hi, bot, zero)],
                axis=0,
            )
        )
    return outs


def _tile(ref, row_slice=None):
    """Read a (rows, D) tile from a 3D (1, rows, D) or 4D (1, rows, 1, D)
    block (the BNHD layout threads a singleton head dim through the specs)."""
    if len(ref.shape) == 3:
        return ref[0] if row_slice is None else ref[0, row_slice, :]
    return ref[0, :, 0, :] if row_slice is None else ref[0, row_slice, 0, :]


def _stats(ref):
    """(8, BLOCK_Q) statistics tile from a 3D (1, 8, BQ) or 4D (1, 1, 8, BQ)
    block."""
    return ref[0] if len(ref.shape) == 3 else ref[0, 0]


def _block_mask(qi, kj, shape, n_real: int, use_lsa: bool):
    """True where the score is VALID. Masks padded keys and (LSA) the
    diagonal."""
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + kj * shape[1]
    mask = col < n_real
    if use_lsa:
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + qi * shape[0]
        mask = jnp.logical_and(mask, row != col)
    return mask


def _key_pad_bias(kj, block_k: int, n_real: int):
    """(1, block_k) additive score bias: 0 on real keys, MASK_VALUE on pad
    columns. In the no-LSA case this replaces the full-matrix mask build +
    select (iota + compare + select per score element) with one broadcast
    add — the blocked kernels run thousands of (q, k) tiles per 34k-token
    step, and the per-tile VPU mask work is a material share of the gap to
    the MXU roofline."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1) + kj * block_k
    return jnp.where(col < n_real, 0.0, MASK_VALUE)


def _apply_mask(s, qi, kj, n_real: int, use_lsa: bool):
    if use_lsa:
        mask = _block_mask(qi, kj, s.shape, n_real, use_lsa)
        return jnp.where(mask, s, MASK_VALUE)
    return s + _key_pad_bias(kj, s.shape[1], n_real)


def _apply_mask_dt(s, qi, kj, n_real: int, use_lsa: bool):
    """Transposed-scores mask: keys on SUBLANES (axis 0), queries on lanes
    (axis 1). Same semantics as _apply_mask: pad keys -> MASK_VALUE, LSA
    masks the global diagonal."""
    if use_lsa:
        key = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + kj * s.shape[0]
        qry = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + qi * s.shape[1]
        mask = jnp.logical_and(key < n_real, key != qry)
        return jnp.where(mask, s, MASK_VALUE)
    key = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0) \
        + kj * s.shape[0]
    return s + jnp.where(key < n_real, 0.0, MASK_VALUE)


# --- forward -------------------------------------------------------------------


def _fwd_kernel(
    seed_ref,
    q_ref, k_ref, v_ref,
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, n_real: int, nq: int, nk: int, use_lsa: bool,
    dropout_rate: float, deterministic: bool,
):
    bh, qi, kj = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (BLOCK_Q, D)
    k = k_ref[0]  # (BLOCK_K, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BLOCK_Q, BLOCK_K)

    s = _apply_mask(s, qi, kj, n_real, use_lsa)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:, :1] = m_next
    l_scr[:, :1] = l_next

    if dropout_rate > 0.0 and not deterministic:
        keep = _dropout_keep_mask(
            seed_ref[0], bh, qi, kj, nq, nk, s.shape, 1.0 - dropout_rate
        )
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)

    v = v_ref[0]  # (BLOCK_K, D)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )

    @pl.when(kj == nk - 1)
    def _store():
        l_final = l_scr[:, :1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        lse_val = m_scr[:, :1] + jnp.log(jnp.maximum(l_scr[:, :1], 1e-37))
        lse_ref[0] = jnp.broadcast_to(lse_val.T, (8, lse_val.shape[0]))


def _fwd_kernel_fullk(
    seed_ref,
    q_ref, k_ref, v_ref,
    o_ref, lse_ref,
    *, n_real: int, nq: int, nk: int, block_k: int, use_lsa: bool,
    dropout_rate: float, deterministic: bool, num_h: int = 0,
):
    """Whole-K variant: all keys/values of one (batch*head) live in VMEM, so
    the kj grid dimension disappears (2x fewer programs at V1T size) and the
    softmax statistics stay in registers — no scratch, no cross-program
    carry. The unrolled chunk loop keeps the scores tile at
    (BLOCK_Q, block_k). With num_h set (BNHD layout) the grid carries a
    separate head dim."""
    if num_h:
        bh = pl.program_id(0) * num_h + pl.program_id(1)
        qi = pl.program_id(2)
    else:
        bh, qi = pl.program_id(0), pl.program_id(1)
    q = _tile(q_ref)  # (BLOCK_Q, D)
    block_q = q.shape[0]

    m = jnp.full((block_q, 1), MASK_VALUE, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, q.shape[1]), jnp.float32)
    for kj in range(nk):
        k = _tile(k_ref, slice(kj * block_k, (kj + 1) * block_k))
        v = _tile(v_ref, slice(kj * block_k, (kj + 1) * block_k))
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
    lse_val = m + jnp.log(jnp.maximum(l, 1e-37))
    if len(o_ref.shape) == 3:
        o_ref[0] = (acc * l_inv).astype(o_ref.dtype)
    else:
        o_ref[0, :, 0, :] = (acc * l_inv).astype(o_ref.dtype)
    if len(lse_ref.shape) == 3:
        lse_ref[0] = jnp.broadcast_to(lse_val.T, (8, block_q))
    else:
        lse_ref[0, 0] = jnp.broadcast_to(lse_val.T, (8, block_q))


def _merged_bwd_kernel_fullk(
    seed_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, n_real: int, nq: int, nk: int, block_k: int, use_lsa: bool,
    dropout_rate: float, deterministic: bool,
):
    """Whole-K merged backward: grid (bh, qi); dq in registers (complete per
    program); dk/dv accumulate in full-length VMEM scratch across qi and are
    written once at the end of each batch*head."""
    bh, qi = pl.program_id(0), pl.program_id(1)

    @pl.when(qi == 0)
    def _init_dkv():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, :1, :].T  # (BLOCK_Q, 1)
    delta = delta_ref[0, :1, :].T
    dq = jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)

    for kj in range(nk):
        ksl = pl.ds(kj * block_k, block_k)
        k = k_ref[0, ksl, :]
        v = v_ref[0, ksl, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = _apply_mask(s, qi, kj, n_real, use_lsa)
        p = jnp.exp(s - lse)
        dp_raw = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
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
        dv_scr[ksl, :] += jax.lax.dot_general(
            p_dropped, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_scr[ksl, :] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(qi == nq - 1)
    def _store_dkv():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _fullk_fits(nk_pad: int, d_pad: int, itemsize: int) -> bool:
    """Whole-K kernels need k+v blocks (+ fp32 dk/dv scratch in the bwd) in
    VMEM alongside the working tiles."""
    kv_bytes = 2 * nk_pad * d_pad * itemsize
    scr_bytes = 2 * nk_pad * d_pad * 4
    return (
        kv_bytes + scr_bytes <= 10 * 1024 * 1024
        and _os.environ.get("V1T_FLASH_FULLK", "1") == "1"
    )


def _use_dt_blocked(n: int, d: int, itemsize: int, block_k: int) -> bool:
    """dt-form blocked kernels: on (default) exactly where the whole-K
    kernels DON'T fit VMEM — long sequences (full-res 34k tokens, large SP
    shards), where the streamed 3-grid kernels run either way and the dt
    orientation cuts the head-dim lane pad 1.65x -> 1.03x on every N^2
    matmul. V1T_FLASH_DT_BLOCKED=1 forces, =0 disables."""
    env = _os.environ.get("V1T_FLASH_DT_BLOCKED", "auto").strip().lower()
    if env in ("1", "true", "force"):
        return True
    if env in ("0", "false"):
        return False
    if env not in ("", "auto"):
        raise ValueError(
            f"V1T_FLASH_DT_BLOCKED={env!r} must be auto/0/1"
        )
    nk_pad = _round_up(n, block_k)
    return not _fullk_fits(nk_pad, _round_up(d, 128), itemsize)


def _flash_forward(q, k, v, seed, *, n_real, use_lsa, dropout_rate,
                   deterministic, block_q, block_k, dt=False):
    BLOCK_Q, BLOCK_K = block_q, block_k
    if dt:
        qT = jnp.swapaxes(q, 1, 2)
        kT = jnp.swapaxes(k, 1, 2)
        vT = jnp.swapaxes(v, 1, 2)
        oT, lse = _flash_forward_dt(
            qT, kT, vT, seed,
            n_real=n_real, use_lsa=use_lsa, dropout_rate=dropout_rate,
            deterministic=deterministic, block_q=BLOCK_Q, block_k=BLOCK_K,
        )
        return jnp.swapaxes(oT, 1, 2), lse
    bhn, nq_pad, d_pad = q.shape
    nk_pad = k.shape[1]
    nq, nk = nq_pad // BLOCK_Q, nk_pad // BLOCK_K

    if _fullk_fits(nk_pad, d_pad, q.dtype.itemsize):
        kernel = functools.partial(
            _fwd_kernel_fullk,
            n_real=n_real, nq=nq, nk=nk, block_k=BLOCK_K, use_lsa=use_lsa,
            dropout_rate=dropout_rate, deterministic=deterministic,
        )
        out, lse = _pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bhn, nq),
                in_specs=[
                    pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, qi, *_: (bh, qi, 0)),
                    pl.BlockSpec((1, nk_pad, d_pad), lambda bh, qi, *_: (bh, 0, 0)),
                    pl.BlockSpec((1, nk_pad, d_pad), lambda bh, qi, *_: (bh, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, qi, *_: (bh, qi, 0)),
                    pl.BlockSpec((1, 8, BLOCK_Q), lambda bh, qi, *_: (bh, 0, qi)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct(q.shape, q.dtype),
                jax.ShapeDtypeStruct((bhn, 8, nq_pad), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(seed, q, k, v)
        return out, lse
    kernel = functools.partial(
        _fwd_kernel,
        n_real=n_real,
        nq=nq,
        nk=nk,
        use_lsa=use_lsa,
        dropout_rate=dropout_rate,
        deterministic=deterministic,
    )
    out, lse = _pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bhn, nq, nk),
            in_specs=[
                pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, qi, kj, *_: (bh, qi, 0)),
                pl.BlockSpec((1, BLOCK_K, d_pad), lambda bh, qi, kj, *_: (bh, kj, 0)),
                pl.BlockSpec((1, BLOCK_K, d_pad), lambda bh, qi, kj, *_: (bh, kj, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, qi, kj, *_: (bh, qi, 0)),
                pl.BlockSpec((1, 8, BLOCK_Q), lambda bh, qi, kj, *_: (bh, 0, qi)),
            ],
            scratch_shapes=[
                pltpu.VMEM((BLOCK_Q, NUM_LANES), jnp.float32),
                pltpu.VMEM((BLOCK_Q, NUM_LANES), jnp.float32),
                pltpu.VMEM((BLOCK_Q, d_pad), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            # row statistics replicated over 8 sublanes to satisfy the TPU
            # (8, 128) tile layout
            jax.ShapeDtypeStruct((bhn, 8, nq_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(seed, q, k, v)
    return out, lse


# --- dt-form (transposed-operand) blocked kernels ---------------------------------
#
# The legacy blocked kernels keep every tile in (tokens, D) orientation, so
# D=155 pads to 256 LANES — 1.65x MACs on all seven N^2 matmuls. The dt
# orientation (measured per-form on v5e, misc/bench_dtform_matmul.py; same
# insight as fused_mha's whole-sequence dt2 kernels) keeps q/k/v/do
# transposed (D, tokens): the head dim pads only at SUBLANE granularity
# (160/155 = 1.03x), scores run transposed (BLOCK_K, BLOCK_Q) with softmax
# reducing over the sublane (key) axis. The softmax exp runs as the
# VPU-native exp2: scores scale by log2(e) INLINE in the pass that already
# masks them (elementwise work between matmuls fuses ~free), so incoming q
# keeps its natural-units contract (the SP entry point pre-folds the score
# scale into q) and every gradient formula stays in natural units — no ln2
# corrections anywhere. The LSE residual keeps the legacy NATURAL-log
# contract (the sequence-parallel combiner consumes it). Dropout masks
# decode inline from raw 16-bit PRNG draws (select-only; the 1/keep_prob
# survivor scale folds into l_inv forward, and into vT/dvT around their
# matmuls in the backward). Replaces reference vit.py:253-284 semantics
# identically.


def _fwd_kernel_dt(
    seed_ref,
    qT_ref, kT_ref, vT_ref,
    oT_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, n_real: int, nq: int, nk: int, use_lsa: bool,
    dropout_rate: float, deterministic: bool,
):
    bh, qi, kj = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    qT = qT_ref[0]  # (DP, BLOCK_Q)
    kT = kT_ref[0]  # (DP, BLOCK_K)
    sT = jax.lax.dot_general(
        kT, qT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BLOCK_K, BLOCK_Q)
    # log2 units from here on: the multiply fuses into the mask pass
    sT = _apply_mask_dt(sT * LOG2E, qi, kj, n_real, use_lsa)

    m_prev = m_scr[:1, :]
    l_prev = l_scr[:1, :]
    m_curr = jnp.max(sT, axis=0, keepdims=True)  # (1, BLOCK_Q)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    pT = jnp.exp2(sT - m_next)
    l_scr[:1, :] = alpha * l_prev + jnp.sum(pT, axis=0, keepdims=True)
    m_scr[:1, :] = m_next

    if dropout_rate > 0.0 and not deterministic:
        bits = _dropout_raw_bits(seed_ref[0], bh, qi, kj, nq, nk, sT.shape)
        (pT,) = _apply_keep_halves(bits, (pT,), 1.0 - dropout_rate, 1.0)

    vT = vT_ref[0]  # (DP, BLOCK_K)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        vT, pT.astype(vT.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (DP, BLOCK_Q)

    @pl.when(kj == nk - 1)
    def _store():
        l_final = l_scr[:1, :]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        if dropout_rate > 0.0 and not deterministic:
            # survivor scale folded off the (N, N) tiles into the row stats
            l_inv = l_inv * (1.0 / (1.0 - dropout_rate))
        oT_ref[0] = (acc_scr[...] * l_inv).astype(oT_ref.dtype)
        # external contract is natural-log LSE (the SP combiner's units)
        lse_nat = (
            m_scr[:1, :] + jnp.log2(jnp.maximum(l_final, 1e-37))
        ) * LN2
        lse_ref[0] = jnp.broadcast_to(lse_nat, (8, lse_nat.shape[1]))


def _flash_forward_dt(qT, kT, vT, seed, *, n_real, use_lsa, dropout_rate,
                      deterministic, block_q, block_k):
    """qT/kT/vT: (BH, DP, N*_pad). Returns oT (BH, DP, NQ_pad) and lse
    (BH, 8, NQ_pad) in natural-log units."""
    bhn, d_pad, nq_pad = qT.shape
    nk_pad = kT.shape[2]
    nq, nk = nq_pad // block_q, nk_pad // block_k
    kernel = functools.partial(
        _fwd_kernel_dt,
        n_real=n_real, nq=nq, nk=nk, use_lsa=use_lsa,
        dropout_rate=dropout_rate, deterministic=deterministic,
    )
    out, lse = _pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bhn, nq, nk),
            in_specs=[
                pl.BlockSpec((1, d_pad, block_q), lambda bh, qi, kj, *_: (bh, 0, qi)),
                pl.BlockSpec((1, d_pad, block_k), lambda bh, qi, kj, *_: (bh, 0, kj)),
                pl.BlockSpec((1, d_pad, block_k), lambda bh, qi, kj, *_: (bh, 0, kj)),
            ],
            out_specs=[
                pl.BlockSpec((1, d_pad, block_q), lambda bh, qi, kj, *_: (bh, 0, qi)),
                pl.BlockSpec((1, 8, block_q), lambda bh, qi, kj, *_: (bh, 0, qi)),
            ],
            scratch_shapes=[
                pltpu.VMEM((8, block_q), jnp.float32),
                pltpu.VMEM((8, block_q), jnp.float32),
                pltpu.VMEM((d_pad, block_q), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(qT.shape, qT.dtype),
            jax.ShapeDtypeStruct((bhn, 8, nq_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(seed, qT, kT, vT)
    return out, lse


def _dq_kernel_dt(
    seed_ref,
    qT_ref, kT_ref, vT_ref, doT_ref, lse_ref, delta_ref,
    dqT_ref,
    dq_scr,
    *, n_real: int, nq: int, nk: int, use_lsa: bool,
    dropout_rate: float, deterministic: bool,
):
    """p recomputes as exp2((s - lse_nat) * log2e) — base-2 exp on
    natural-unit scores, one fused (BLOCK_K, BLOCK_Q) pass. ds stays in
    natural units so every gradient matmul matches the legacy kernels."""
    bh, qi, kj = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    qT = qT_ref[0]
    kT = kT_ref[0]
    vT = vT_ref[0]
    doT = doT_ref[0]
    lse = lse_ref[0, :1, :]  # (1, BLOCK_Q), natural log
    delta = delta_ref[0, :1, :]

    sT = jax.lax.dot_general(
        kT, qT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    sT = _apply_mask_dt(sT, qi, kj, n_real, use_lsa)
    pT = jnp.exp2((sT - lse) * LOG2E)

    bits = None
    if dropout_rate > 0.0 and not deterministic:
        bits = _dropout_raw_bits(seed_ref[0], bh, qi, kj, nq, nk, sT.shape)
        # survivor scale rides the SMALL (DP, BLOCK_K) operand, not the
        # (BLOCK_K, BLOCK_Q) tile
        vT = (
            vT.astype(jnp.float32) * (1.0 / (1.0 - dropout_rate))
        ).astype(vT.dtype)
    dpT = jax.lax.dot_general(
        vT, doT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BLOCK_K, BLOCK_Q)
    if bits is not None:
        (dpT,) = _apply_keep_halves(bits, (dpT,), 1.0 - dropout_rate, 1.0)

    dsT = pT * (dpT - delta)
    dq_scr[...] += jax.lax.dot_general(
        kT, dsT.astype(kT.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (DP, BLOCK_Q)

    @pl.when(kj == nk - 1)
    def _store():
        dqT_ref[0] = dq_scr[...].astype(dqT_ref.dtype)


def _dkv_kernel_dt(
    seed_ref,
    qT_ref, kT_ref, vT_ref, doT_ref, lse_ref, delta_ref,
    dkT_ref, dvT_ref,
    dk_scr, dv_scr,
    *, n_real: int, nq: int, nk: int, use_lsa: bool,
    dropout_rate: float, deterministic: bool,
):
    bh, kj, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    qT = qT_ref[0]
    kT = kT_ref[0]
    vT = vT_ref[0]
    doT = doT_ref[0]
    lse = lse_ref[0, :1, :]  # (1, BLOCK_Q), natural log
    delta = delta_ref[0, :1, :]

    sT = jax.lax.dot_general(
        kT, qT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    sT = _apply_mask_dt(sT, qi, kj, n_real, use_lsa)
    pT = jnp.exp2((sT - lse) * LOG2E)

    bits = None
    if dropout_rate > 0.0 and not deterministic:
        bits = _dropout_raw_bits(seed_ref[0], bh, qi, kj, nq, nk, sT.shape)
        vT = (
            vT.astype(jnp.float32) * (1.0 / (1.0 - dropout_rate))
        ).astype(vT.dtype)
    dpT_raw = jax.lax.dot_general(
        vT, doT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bits is not None:
        pT_dropped, dpT = _apply_keep_halves(
            bits, (pT, dpT_raw), 1.0 - dropout_rate, 1.0
        )
    else:
        pT_dropped = pT
        dpT = dpT_raw

    # dvT[d, k] += sum_q doT[d, q] p_dropped[k, q]; the survivor scale is
    # constant so it folds into the single final store below
    dv_scr[...] += jax.lax.dot_general(
        doT, pT_dropped.astype(doT.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (DP, BLOCK_K)
    dsT = pT * (dpT - delta)
    dk_scr[...] += jax.lax.dot_general(
        qT, dsT.astype(qT.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (DP, BLOCK_K)

    @pl.when(qi == nq - 1)
    def _store():
        dkT_ref[0] = dk_scr[...].astype(dkT_ref.dtype)
        dv = dv_scr[...]
        if dropout_rate > 0.0 and not deterministic:
            dv = dv * (1.0 / (1.0 - dropout_rate))
        dvT_ref[0] = dv.astype(dvT_ref.dtype)


def _flash_backward_dt(qT, kT, vT, seed, lse, doT, delta, *, n_real, use_lsa,
                       dropout_rate, deterministic, block_q, block_k):
    bhn, d_pad, nq_pad = qT.shape
    nk_pad = kT.shape[2]
    nq, nk = nq_pad // block_q, nk_pad // block_k
    common = dict(
        n_real=n_real, nq=nq, nk=nk, use_lsa=use_lsa,
        dropout_rate=dropout_rate, deterministic=deterministic,
    )
    in_specs_q_major = [
        pl.BlockSpec((1, d_pad, block_q), lambda bh, qi, kj, *_: (bh, 0, qi)),
        pl.BlockSpec((1, d_pad, block_k), lambda bh, qi, kj, *_: (bh, 0, kj)),
        pl.BlockSpec((1, d_pad, block_k), lambda bh, qi, kj, *_: (bh, 0, kj)),
        pl.BlockSpec((1, d_pad, block_q), lambda bh, qi, kj, *_: (bh, 0, qi)),
        pl.BlockSpec((1, 8, block_q), lambda bh, qi, kj, *_: (bh, 0, qi)),
        pl.BlockSpec((1, 8, block_q), lambda bh, qi, kj, *_: (bh, 0, qi)),
    ]
    dqT = _pallas_call(
        functools.partial(_dq_kernel_dt, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bhn, nq, nk),
            in_specs=in_specs_q_major,
            out_specs=[
                pl.BlockSpec((1, d_pad, block_q), lambda bh, qi, kj, *_: (bh, 0, qi)),
            ],
            scratch_shapes=[pltpu.VMEM((d_pad, block_q), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct(qT.shape, qT.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(seed, qT, kT, vT, doT, lse, delta)[0]

    in_specs_k_major = [
        pl.BlockSpec((1, d_pad, block_q), lambda bh, kj, qi, *_: (bh, 0, qi)),
        pl.BlockSpec((1, d_pad, block_k), lambda bh, kj, qi, *_: (bh, 0, kj)),
        pl.BlockSpec((1, d_pad, block_k), lambda bh, kj, qi, *_: (bh, 0, kj)),
        pl.BlockSpec((1, d_pad, block_q), lambda bh, kj, qi, *_: (bh, 0, qi)),
        pl.BlockSpec((1, 8, block_q), lambda bh, kj, qi, *_: (bh, 0, qi)),
        pl.BlockSpec((1, 8, block_q), lambda bh, kj, qi, *_: (bh, 0, qi)),
    ]
    dkT, dvT = _pallas_call(
        functools.partial(_dkv_kernel_dt, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bhn, nk, nq),
            in_specs=in_specs_k_major,
            out_specs=[
                pl.BlockSpec((1, d_pad, block_k), lambda bh, kj, qi, *_: (bh, 0, kj)),
                pl.BlockSpec((1, d_pad, block_k), lambda bh, kj, qi, *_: (bh, 0, kj)),
            ],
            scratch_shapes=[
                pltpu.VMEM((d_pad, block_k), jnp.float32),
                pltpu.VMEM((d_pad, block_k), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(kT.shape, kT.dtype),
            jax.ShapeDtypeStruct(vT.shape, vT.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(seed, qT, kT, vT, doT, lse, delta)
    return dqT, dkT, dvT


# --- backward ------------------------------------------------------------------


def _dq_kernel(
    seed_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_scr,
    *, n_real: int, nq: int, nk: int, use_lsa: bool,
    dropout_rate: float, deterministic: bool,
):
    bh, qi, kj = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, :1, :].T  # (BLOCK_Q, 1)
    delta = delta_ref[0, :1, :].T

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = _apply_mask(s, qi, kj, n_real, use_lsa)
    p = jnp.exp(s - lse)

    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BLOCK_Q, BLOCK_K)
    if dropout_rate > 0.0 and not deterministic:
        keep = _dropout_keep_mask(
            seed_ref[0], bh, qi, kj, nq, nk, s.shape, 1.0 - dropout_rate
        )
        dp = jnp.where(keep, dp / (1.0 - dropout_rate), 0.0)

    ds = p * (dp - delta)
    dq_scr[...] += jax.lax.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    )

    @pl.when(kj == nk - 1)
    def _store():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _dkv_kernel(
    seed_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, n_real: int, nq: int, nk: int, use_lsa: bool,
    dropout_rate: float, deterministic: bool,
):
    bh, kj, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, :1, :].T  # (BLOCK_Q, 1)
    delta = delta_ref[0, :1, :].T

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BLOCK_Q, BLOCK_K)
    s = _apply_mask(s, qi, kj, n_real, use_lsa)
    p = jnp.exp(s - lse)

    if dropout_rate > 0.0 and not deterministic:
        keep = _dropout_keep_mask(
            seed_ref[0], bh, qi, kj, nq, nk, s.shape, 1.0 - dropout_rate
        )
        inv_keep = 1.0 / (1.0 - dropout_rate)
        p_dropped = jnp.where(keep, p * inv_keep, 0.0)
        dp = jnp.where(
            keep,
            jax.lax.dot_general(
                do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * inv_keep,
            0.0,
        )
    else:
        p_dropped = p
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # dv += p_dropped^T @ dO
    dv_scr[...] += jax.lax.dot_general(
        p_dropped, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    # dk += ds^T @ q
    dk_scr[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == nq - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _merged_bwd_kernel(
    seed_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref,
    dq_scr, dk_scr, dv_scr,
    *, n_real: int, nq: int, nk: int, use_lsa: bool,
    dropout_rate: float, deterministic: bool, block_k: int, num_h: int = 0,
):
    """Single-pass backward: dq accumulates in a per-q-block scratch across
    the inner kj loop; dk/dv accumulate in FULL-LENGTH VMEM scratch across
    the whole (qi, kj) iteration of one batch*head — 5 MXU matmuls per block
    pair instead of the 7 a separate-dq design costs (s and dp recomputed
    once, not twice)."""
    bh, qi, kj = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(kj == 0)
    def _init_dq():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    @pl.when(jnp.logical_and(qi == 0, kj == 0))
    def _init_dkv():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = _tile(q_ref)
    k = _tile(k_ref)
    v = _tile(v_ref)
    do = _tile(do_ref).astype(jnp.float32)
    lse = _stats(lse_ref)[:1, :].T  # (BLOCK_Q, 1)
    delta = _stats(delta_ref)[:1, :].T

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BLOCK_Q, BLOCK_K)
    s = _apply_mask(s, qi, kj, n_real, use_lsa)
    p = jnp.exp(s - lse)

    dp_raw = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
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

    # dq[qi] += ds @ k   (accumulates over kj in per-block scratch)
    dq_scr[...] += jax.lax.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    )
    # dv[kj] += p_dropped^T @ dO ; dk[kj] += ds^T @ q  (full-length scratch)
    ksl = pl.ds(kj * block_k, block_k)
    dv_scr[ksl, :] += jax.lax.dot_general(
        p_dropped, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_scr[ksl, :] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kj == nk - 1)
    def _store_dq():
        if len(dq_ref.shape) == 3:
            dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)
        else:
            dq_ref[0, :, 0, :] = dq_scr[...].astype(dq_ref.dtype)

    @pl.when(qi == nq - 1)
    def _store_dkv():
        if len(dk_ref.shape) == 3:
            dk_ref[0] = dk_scr[ksl, :].astype(dk_ref.dtype)
            dv_ref[0] = dv_scr[ksl, :].astype(dv_ref.dtype)
        else:
            dk_ref[0, ksl, 0, :] = dk_scr[ksl, :].astype(dk_ref.dtype)
            dv_ref[0, ksl, 0, :] = dv_scr[ksl, :].astype(dv_ref.dtype)


def _flash_backward_merged(q, k, v, seed, lse, do, delta, *, n_real, use_lsa,
                           dropout_rate, deterministic, block_q, block_k):
    BLOCK_Q, BLOCK_K = block_q, block_k
    bhn, nq_pad, d_pad = q.shape
    nk_pad = k.shape[1]
    nq, nk = nq_pad // BLOCK_Q, nk_pad // BLOCK_K
    kernel = functools.partial(
        _merged_bwd_kernel,
        n_real=n_real, nq=nq, nk=nk, use_lsa=use_lsa,
        dropout_rate=dropout_rate, deterministic=deterministic,
        block_k=BLOCK_K,
    )
    dq, dk, dv = _pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bhn, nq, nk),
            in_specs=[
                pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, qi, kj, *_: (bh, qi, 0)),
                pl.BlockSpec((1, BLOCK_K, d_pad), lambda bh, qi, kj, *_: (bh, kj, 0)),
                pl.BlockSpec((1, BLOCK_K, d_pad), lambda bh, qi, kj, *_: (bh, kj, 0)),
                pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, qi, kj, *_: (bh, qi, 0)),
                pl.BlockSpec((1, 8, BLOCK_Q), lambda bh, qi, kj, *_: (bh, 0, qi)),
                pl.BlockSpec((1, 8, BLOCK_Q), lambda bh, qi, kj, *_: (bh, 0, qi)),
            ],
            out_specs=[
                pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, qi, kj, *_: (bh, qi, 0)),
                pl.BlockSpec((1, BLOCK_K, d_pad), lambda bh, qi, kj, *_: (bh, kj, 0)),
                pl.BlockSpec((1, BLOCK_K, d_pad), lambda bh, qi, kj, *_: (bh, kj, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((BLOCK_Q, d_pad), jnp.float32),
                pltpu.VMEM((nk_pad, d_pad), jnp.float32),
                pltpu.VMEM((nk_pad, d_pad), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
    )(seed, q, k, v, do, lse, delta)
    return dq, dk, dv


def _flash_backward(q, k, v, seed, out, lse, do, *, n_real, use_lsa,
                    dropout_rate, deterministic, block_q, block_k,
                    dlse=None, dt=False):
    BLOCK_Q, BLOCK_K = block_q, block_k
    bhn, nq_pad, d_pad = q.shape
    nk_pad = k.shape[1]
    nq, nk = nq_pad // BLOCK_Q, nk_pad // BLOCK_K
    delta = jnp.sum(
        out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1
    )  # (BH, N)
    if dlse is not None:
        # cotangent of the returned LSE (flash_attention_with_lse): since
        # d lse_i / d s_ij = p_ij and every kernel computes
        # ds = p * (dp - delta), folding -dlse into delta adds the exact
        # p * dlse term — no kernel changes needed (the dt kernels' extra
        # ln2 on ds is exactly d lse_nat/d s_log2, so the fold stays exact
        # there too)
        delta = delta - dlse.astype(jnp.float32)
    delta = jnp.broadcast_to(delta[:, None, :], (bhn, 8, nq_pad))

    if dt:
        dqT, dkT, dvT = _flash_backward_dt(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
            jnp.swapaxes(v, 1, 2), seed, lse, jnp.swapaxes(do, 1, 2), delta,
            n_real=n_real, use_lsa=use_lsa, dropout_rate=dropout_rate,
            deterministic=deterministic, block_q=BLOCK_Q, block_k=BLOCK_K,
        )
        return (
            jnp.swapaxes(dqT, 1, 2),
            jnp.swapaxes(dkT, 1, 2),
            jnp.swapaxes(dvT, 1, 2),
        )

    # whole-K backward needs double-buffered full-length dk/dv outputs in
    # VMEM on top of the scratch — only worth it for small K; opt-in
    bwd_fullk = (
        _os.environ.get("V1T_FLASH_FULLK_BWD", "0") == "1"
        and _fullk_fits(nk_pad, d_pad, q.dtype.itemsize)
    )
    if bwd_fullk:
        kernel = functools.partial(
            _merged_bwd_kernel_fullk,
            n_real=n_real, nq=nq, nk=nk, block_k=BLOCK_K, use_lsa=use_lsa,
            dropout_rate=dropout_rate, deterministic=deterministic,
        )
        dq, dk, dv = _pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bhn, nq),
                in_specs=[
                    pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, qi, *_: (bh, qi, 0)),
                    pl.BlockSpec((1, nk_pad, d_pad), lambda bh, qi, *_: (bh, 0, 0)),
                    pl.BlockSpec((1, nk_pad, d_pad), lambda bh, qi, *_: (bh, 0, 0)),
                    pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, qi, *_: (bh, qi, 0)),
                    pl.BlockSpec((1, 8, BLOCK_Q), lambda bh, qi, *_: (bh, 0, qi)),
                    pl.BlockSpec((1, 8, BLOCK_Q), lambda bh, qi, *_: (bh, 0, qi)),
                ],
                out_specs=[
                    pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, qi, *_: (bh, qi, 0)),
                    pl.BlockSpec((1, nk_pad, d_pad), lambda bh, qi, *_: (bh, 0, 0)),
                    pl.BlockSpec((1, nk_pad, d_pad), lambda bh, qi, *_: (bh, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((nk_pad, d_pad), jnp.float32),
                    pltpu.VMEM((nk_pad, d_pad), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct(q.shape, q.dtype),
                jax.ShapeDtypeStruct(k.shape, k.dtype),
                jax.ShapeDtypeStruct(v.shape, v.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(seed, q, k, v, do, lse, delta)
        return dq, dk, dv

    # merged single-pass backward (default): 5 matmuls/block-pair; the dk/dv
    # full-length scratch (nk_pad x d_pad fp32 x2) must fit VMEM
    merged_ok = nk_pad * d_pad * 4 * 2 <= 8 * 1024 * 1024
    if merged_ok and _os.environ.get("V1T_FLASH_MERGED_BWD", "1") == "1":
        return _flash_backward_merged(
            q, k, v, seed, lse, do, delta,
            n_real=n_real, use_lsa=use_lsa, dropout_rate=dropout_rate,
            deterministic=deterministic, block_q=block_q, block_k=block_k,
        )

    common = dict(
        n_real=n_real, nq=nq, nk=nk, use_lsa=use_lsa,
        dropout_rate=dropout_rate, deterministic=deterministic,
    )
    in_specs_q_major = [
        pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, qi, kj, *_: (bh, qi, 0)),  # q
        pl.BlockSpec((1, BLOCK_K, d_pad), lambda bh, qi, kj, *_: (bh, kj, 0)),  # k
        pl.BlockSpec((1, BLOCK_K, d_pad), lambda bh, qi, kj, *_: (bh, kj, 0)),  # v
        pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, qi, kj, *_: (bh, qi, 0)),  # do
        pl.BlockSpec((1, 8, BLOCK_Q), lambda bh, qi, kj, *_: (bh, 0, qi)),  # lse
        pl.BlockSpec((1, 8, BLOCK_Q), lambda bh, qi, kj, *_: (bh, 0, qi)),  # delta
    ]
    dq = _pallas_call(
        functools.partial(_dq_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bhn, nq, nk),
            in_specs=in_specs_q_major,
            out_specs=[
                pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, qi, kj, *_: (bh, qi, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((BLOCK_Q, d_pad), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(seed, q, k, v, do, lse, delta)[0]

    in_specs_k_major = [
        pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, kj, qi, *_: (bh, qi, 0)),  # q
        pl.BlockSpec((1, BLOCK_K, d_pad), lambda bh, kj, qi, *_: (bh, kj, 0)),  # k
        pl.BlockSpec((1, BLOCK_K, d_pad), lambda bh, kj, qi, *_: (bh, kj, 0)),  # v
        pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, kj, qi, *_: (bh, qi, 0)),  # do
        pl.BlockSpec((1, 8, BLOCK_Q), lambda bh, kj, qi, *_: (bh, 0, qi)),  # lse
        pl.BlockSpec((1, 8, BLOCK_Q), lambda bh, kj, qi, *_: (bh, 0, qi)),  # delta
    ]
    dk, dv = _pallas_call(
        functools.partial(_dkv_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bhn, nk, nq),
            in_specs=in_specs_k_major,
            out_specs=[
                pl.BlockSpec((1, BLOCK_K, d_pad), lambda bh, kj, qi, *_: (bh, kj, 0)),
                pl.BlockSpec((1, BLOCK_K, d_pad), lambda bh, kj, qi, *_: (bh, kj, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((BLOCK_K, d_pad), jnp.float32),
                pltpu.VMEM((BLOCK_K, d_pad), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(seed, q, k, v, do, lse, delta)
    return dq, dk, dv


# --- custom VJP core -------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_core(static_cfg, q, k, v, seed):
    (n_real, use_lsa, dropout_rate, deterministic, block_q, block_k,
     dt) = static_cfg
    out, _ = _flash_forward(
        q, k, v, seed,
        n_real=n_real, use_lsa=use_lsa,
        dropout_rate=dropout_rate, deterministic=deterministic,
        block_q=block_q, block_k=block_k, dt=dt,
    )
    return out


def _flash_core_fwd(static_cfg, q, k, v, seed):
    (n_real, use_lsa, dropout_rate, deterministic, block_q, block_k,
     dt) = static_cfg
    out, lse = _flash_forward(
        q, k, v, seed,
        n_real=n_real, use_lsa=use_lsa,
        dropout_rate=dropout_rate, deterministic=deterministic,
        block_q=block_q, block_k=block_k, dt=dt,
    )
    return out, (q, k, v, seed, out, lse)


def _flash_core_bwd(static_cfg, residuals, do):
    (n_real, use_lsa, dropout_rate, deterministic, block_q, block_k,
     dt) = static_cfg
    q, k, v, seed, out, lse = residuals
    dq, dk, dv = _flash_backward(
        q, k, v, seed, out, lse, do,
        n_real=n_real, use_lsa=use_lsa,
        dropout_rate=dropout_rate, deterministic=deterministic,
        block_q=block_q, block_k=block_k, dt=dt,
    )
    return dq, dk, dv, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)



# --- public API ------------------------------------------------------------------


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: jax.Array,
    *,
    use_lsa: bool = False,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    rng: t.Optional[jax.Array] = None,
):
    """softmax(q k^T * scale) v with LSA + fused dropout; (B, H, N, D) in/out.

    The (possibly per-head, learnable) ``scale`` is folded into Q outside the
    kernel so its gradient flows through standard XLA autodiff; the custom
    VJP covers only the blockwise attention itself.
    """
    b, h, n, d = q.shape
    block_q, block_k = pick_blocks(n)
    dt = _use_dt_blocked(n, d, q.dtype.itemsize, block_k)
    scale = jnp.asarray(scale, jnp.float32)
    if scale.ndim == 1:
        q = q * scale[None, :, None, None].astype(q.dtype)
    else:
        q = q * scale.astype(q.dtype)

    # q and k lengths pad independently to their own block sizes (attention
    # is rectangular): padded keys are masked inside the kernel, padded query
    # rows are sliced off here. dt keeps the head dim at sublane granularity
    # (that is the point); legacy tiles carry it on lanes
    nq_pad = _round_up(n, block_q)
    nk_pad = _round_up(n, block_k)
    d_pad = _round_up(d, 16) if dt else _round_up(d, 128)

    def prep(x, n_pad):
        x = x.reshape(b * h, n, d)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, d_pad - d)))

    qp, kp, vp = prep(q, nq_pad), prep(k, nk_pad), prep(v, nk_pad)

    if rng is None or deterministic or dropout_rate == 0.0:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jax.random.randint(rng, (1,), 0, 2**31 - 1, dtype=jnp.int32)

    static_cfg = (n, bool(use_lsa), float(dropout_rate), bool(deterministic),
                  block_q, block_k, dt)
    from v1t_tpu.parallel.kernel_sharding import call_kernel  # noqa: E402

    # qp/kp/vp lead with B*H — divisible by the mesh's batch axis whenever B
    # is, so the (b h) n d layout shards over "data" without a reshape
    out = call_kernel(
        _flash_core, static_cfg, (qp, kp, vp, seed), batched=(0, 1, 2),
        seed_index=3,
    )
    return out[:, :n, :d].reshape(b, h, n, d)


# --- rectangular flash with LSE export (sequence parallelism) --------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_lse_core(static_cfg, q, k, v, seed):
    n_real, dropout_rate, deterministic, block_q, block_k, dt = static_cfg
    out, lse = _flash_forward(
        q, k, v, seed,
        n_real=n_real, use_lsa=False,
        dropout_rate=dropout_rate, deterministic=deterministic,
        block_q=block_q, block_k=block_k, dt=dt,
    )
    return out, lse[:, 0, :]


def _flash_lse_core_fwd(static_cfg, q, k, v, seed):
    n_real, dropout_rate, deterministic, block_q, block_k, dt = static_cfg
    out, lse = _flash_forward(
        q, k, v, seed,
        n_real=n_real, use_lsa=False,
        dropout_rate=dropout_rate, deterministic=deterministic,
        block_q=block_q, block_k=block_k, dt=dt,
    )
    return (out, lse[:, 0, :]), (q, k, v, seed, out, lse)


def _flash_lse_core_bwd(static_cfg, residuals, cts):
    n_real, dropout_rate, deterministic, block_q, block_k, dt = static_cfg
    q, k, v, seed, out, lse = residuals
    do, dlse = cts
    dq, dk, dv = _flash_backward(
        q, k, v, seed, out, lse, do,
        n_real=n_real, use_lsa=False,
        dropout_rate=dropout_rate, deterministic=deterministic,
        block_q=block_q, block_k=block_k, dlse=dlse, dt=dt,
    )
    return dq, dk, dv, None


_flash_lse_core.defvjp(_flash_lse_core_fwd, _flash_lse_core_bwd)


def flash_attention_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    n_real_k: t.Optional[int] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    rng: t.Optional[jax.Array] = None,
):
    """RECTANGULAR blockwise attention returning ``(out, lse)``.

    q: (B, H, Nq, D) against k/v: (B, H, Nk, D) — the sequence-parallel
    building block (v1t_tpu/parallel/sequence.py): each token shard attends
    its local queries against gathered/rotating key blocks, and partial
    results combine EXACTLY via the returned log-sum-exp
    (``out_tot = sum_b out_b * exp(lse_b - logaddexp_b lse_b)``). The LSE
    cotangent folds into the flash backward's delta, so the combination is
    fully differentiable.

    The softmax scale must be pre-folded into q. LSA is not supported (the
    in-kernel diagonal mask assumes q and k share global indexing — the SP
    caller falls back to the einsum path under LSA). ``n_real_k`` masks keys
    past the true length; q padding rows are sliced off here.
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    n_real = int(n_real_k) if n_real_k is not None else nk
    block_q = pick_blocks(nq)[0]
    block_k = pick_blocks(nk)[1]
    dt = _use_dt_blocked(nk, d, q.dtype.itemsize, block_k)
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, block_k)
    d_pad = _round_up(d, 16) if dt else _round_up(d, 128)

    def prep(x, n, n_pad):
        x = x.reshape(b * h, n, d)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, d_pad - d)))

    qp = prep(q, nq, nq_pad)
    kp, vp = prep(k, nk, nk_pad), prep(v, nk, nk_pad)
    if rng is None or deterministic or dropout_rate == 0.0:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jax.random.randint(rng, (1,), 0, 2**31 - 1, dtype=jnp.int32)
    static_cfg = (
        n_real, float(dropout_rate), bool(deterministic), block_q, block_k,
        dt,
    )
    out, lse = _flash_lse_core(static_cfg, qp, kp, vp, seed)
    return (
        out[:, :nq, :d].reshape(b, h, nq, d),
        lse[:, :nq].reshape(b, h, nq),
    )
