"""Per-piece ablation of the dt2 fused-attention FORWARD kernel.

Times the whole-sequence dt2 forward (v1t_tpu/ops/fused_mha.py
_mha_fwd_kernel_dt2) with individual pipeline pieces removed, at the
flagship shapes (B=64, N=1654, E=155, H=4). The deltas attribute the
~11 us/(b,h) of non-MXU program time to specific N^2 passes — VPU passes
here are VMEM-bandwidth-bound, so only removing whole passes (not ALU ops
within a pass) can show up. EXCLUSIVE chip required.

Variants (cumulative-free, each toggles ONE piece off the full kernel):
  full        complete forward (mask, max, exp2, sum, dropout, norm)
  nodrop      dropout off (PRNG draw + 2 half-selects removed)
  nomask      pad-key mask add removed (WRONG for pads, timing only)
  nomax       m = 0 (max reduce pass removed; exp kept)
  noexp       pT = sT - m (exp2 transcendental removed, pass kept)
  nosum       l = 1 (sum reduce pass removed)
  matmuls     scores + pv matmuls only (softmax bypassed entirely)
  projout     h==0 projection + out-projection/acc only (no attention)

Usage: python misc/bench_mha_ablate.py [dropout]
"""

import functools
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from v1t_tpu.ops.fused_mha import (
    _apply_mask_t,
    _dt2_weights,
    _layernorm,
    _round_up,
    LOG2E,
)
from v1t_tpu.ops.flash_attention import _apply_keep_halves, _dropout_raw_bits

B, N, E, HEADS, D = 64, 1654, 155, 4, 155


def _kernel(
    seed_ref, x_ref, brow_ref, g_ref, beta_ref, wqkvp_ref, wpp_ref, bp_ref,
    scale_ref, out_ref, proj_scr, acc_scr, ln_scr,
    *, n_real, num_heads, dp, dropout_rate, ablate,
):
    b, h = pl.program_id(0), pl.program_id(1)
    npad = x_ref.shape[1]

    @pl.when(h == 0)
    def _compute_projections():
        ln, _, _ = _layernorm(
            (x_ref[0] + brow_ref[0]).astype(jnp.float32), g_ref[0],
            beta_ref[0])
        ln_scr[...] = ln.astype(ln_scr.dtype)
        proj_scr[...] = jax.lax.dot_general(
            wqkvp_ref[...], ln_scr[...], (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(proj_scr.dtype)

    hp = num_heads * dp
    scale = scale_ref[0, h] * LOG2E
    qrawT = proj_scr[pl.ds(h * dp, dp), :]
    kT = proj_scr[pl.ds(hp + h * dp, dp), :]
    vT = proj_scr[pl.ds(2 * hp + h * dp, dp), :]
    qT = (qrawT.astype(jnp.float32) * scale).astype(kT.dtype)

    if ablate == "projout":
        oT = vT
    else:
        bits = None
        if dropout_rate > 0.0 and ablate not in ("nodrop", "matmuls"):
            bh = b * num_heads + h
            bits = _dropout_raw_bits(
                seed_ref[0], bh, 0, 0, 1, 1, (npad, npad))
        sT = jax.lax.dot_general(
            kT, qT, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if ablate == "matmuls":
            pT = sT
        else:
            if ablate != "nomask":
                sT = _apply_mask_t(sT, n_real, False)
            if ablate == "nomax":
                m = jnp.zeros((1, npad), jnp.float32)
            else:
                m = jnp.max(sT, axis=0, keepdims=True)
            if ablate == "noexp":
                pT = sT - m
            else:
                pT = jnp.exp2(sT - m)
            if ablate == "nosum":
                l = jnp.ones((1, npad), jnp.float32)
            else:
                l = jnp.sum(pT, axis=0, keepdims=True)
            if bits is not None:
                (pT,) = _apply_keep_halves(
                    bits, (pT,), 1.0 - dropout_rate, 1.0)
        outT = jax.lax.dot_general(
            vT, pT.astype(vT.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if ablate == "matmuls":
            oT = outT.astype(out_ref.dtype)
        else:
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            oT = (outT * l_inv).astype(out_ref.dtype)

    proj = jax.lax.dot_general(
        oT, wpp_ref[pl.ds(h * dp, dp), :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(h == 0)
    def _init_acc():
        acc_scr[...] = proj + bp_ref[0][None, :].astype(jnp.float32)

    @pl.when(h > 0)
    def _add_acc():
        acc_scr[...] += proj

    @pl.when(h == num_heads - 1)
    def _writeback():
        out_ref[0] = acc_scr[...].astype(out_ref.dtype)


def _build(ablate, dropout_rate, reps):
    npad = _round_up(N, 128)
    dp = _round_up(D, 16)

    def one(x_pad, brow, gamma, beta, wqkvp, wpp, bp, scale, seed):
        return pl.pallas_call(
            functools.partial(
                _kernel, n_real=N, num_heads=HEADS, dp=dp,
                dropout_rate=dropout_rate, ablate=ablate),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, HEADS),
                in_specs=[
                    pl.BlockSpec((1, npad, E), lambda bi, hi, *_: (bi, 0, 0)),
                    pl.BlockSpec((1, 1, E), lambda bi, hi, *_: (bi, 0, 0)),
                    pl.BlockSpec((1, E), lambda bi, hi, *_: (0, 0)),
                    pl.BlockSpec((1, E), lambda bi, hi, *_: (0, 0)),
                    pl.BlockSpec(
                        (E, 3 * HEADS * dp), lambda bi, hi, *_: (0, 0)),
                    pl.BlockSpec((HEADS * dp, E), lambda bi, hi, *_: (0, 0)),
                    pl.BlockSpec((1, E), lambda bi, hi, *_: (0, 0)),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=[
                    pl.BlockSpec((1, npad, E), lambda bi, hi, *_: (bi, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((3 * HEADS * dp, npad), jnp.bfloat16),
                    pltpu.VMEM((npad, E), jnp.float32),
                    pltpu.VMEM((npad, E), jnp.bfloat16),
                ],
            ),
            out_shape=[jax.ShapeDtypeStruct((B, npad, E), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(seed, x_pad, brow, gamma, beta, wqkvp, wpp, bp, scale)[0]

    def call(x_pad, brow, gamma, beta, wqkvp, wpp, bp, scale, seed):
        # reps serially-chained invocations (out -> next x; the leading
        # LayerNorm renormalizes every round so magnitudes stay put), then
        # a scalar reduce the caller pulls to host — the only sync the
        # axon relay honors reliably. Slope between two reps counts
        # cancels RTT + dispatch.
        def body(i, x):
            return one(x, brow, gamma, beta, wqkvp, wpp, bp, scale,
                       seed + i)
        x = jax.lax.fori_loop(0, reps, body, x_pad)
        return jnp.sum(x[0, :8, :].astype(jnp.float32))

    return jax.jit(call), npad, dp


def main():
    dropout = 0.2544 if (len(sys.argv) > 1 and sys.argv[1] == "dropout") \
        else 0.0
    rng = np.random.default_rng(0)
    npad = _round_up(N, 128)
    dp = _round_up(D, 16)
    x = np.zeros((B, npad, E), np.float32)
    x[:, :N] = rng.normal(size=(B, N, E)) * 0.3
    x_pad = jnp.asarray(x, jnp.bfloat16)
    brow = jnp.asarray(rng.normal(size=(B, 1, E)) * 0.1, jnp.bfloat16)
    gamma = jnp.ones((1, E), jnp.float32)
    beta = jnp.zeros((1, E), jnp.float32)
    wqkv = jnp.asarray(
        rng.normal(size=(3, HEADS, E, D)) * 0.05, jnp.bfloat16)
    wp = jnp.asarray(rng.normal(size=(HEADS, D, E)) * 0.05, jnp.bfloat16)
    wqkvp, _, wpp = _dt2_weights(wqkv, wp, dp)
    bp = jnp.zeros((1, E), jnp.bfloat16)
    scale = jnp.full((1, HEADS), E ** -0.5, jnp.float32)
    args = (x_pad, brow, gamma, beta, wqkvp, wpp, bp, scale)

    variants = ["full", "nodrop", "nomask", "nomax", "noexp", "nosum",
                "matmuls", "projout"]
    if dropout == 0.0:
        variants.remove("nodrop")
    REPS_LO, REPS_HI = 8, 40
    results = {}
    for v in variants:
        times = {}
        for reps in (REPS_LO, REPS_HI):
            fn, _, _ = _build(v, dropout, reps)
            sd = jnp.full((1,), 7, jnp.int32)
            val = float(fn(*args, sd))  # compile + real host-pull sync
            # math-wrong timing variants (noexp feeds unnormalized scores
            # downstream) may chain to non-finite values; timing is valid
            assert np.isfinite(val) or v in (
                "noexp", "nomax", "nosum", "nomask", "matmuls"
            ), (v, reps, val)
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                val = float(fn(*args, sd))
                best = min(best, time.perf_counter() - t0)
            times[reps] = best
        per_call = (times[REPS_HI] - times[REPS_LO]) / (REPS_HI - REPS_LO)
        results[v] = per_call * 1e3
        us = per_call * 1e6 / (B * HEADS)
        print(f"{v:10s} {per_call*1e3:8.3f} ms   {us:6.2f} us/(b,h)")
    full = results["full"]
    print("-- deltas vs full (positive = piece costs this much) --")
    for v, ms in results.items():
        if v != "full":
            print(f"{v:10s} {full-ms:+8.3f} ms  "
                  f"{(full-ms)*1e3/(B*HEADS):+6.2f} us/(b,h)")


if __name__ == "__main__":
    main()
