"""MXU-based bilinear interpolation for the Gaussian2d readout.

TPU has no hardware gather/scatter: XLA lowers the readout's per-neuron
bilinear sampling (4 corner gathers of (B, N) points from a (B, H*W, C)
table) onto slow serialized paths — profiled at V1T batch 64, the forward
gathers cost ~15 ms/step and the 4 backward corner *scatters* ~30 ms/step,
making the readout the second-largest step component after attention.

This module reformulates sampling as dense structured matmuls:

    out[b, c, p] = sum_t flat[b, c, t] * A[b, t, p]
    A[b, t, p]   = relu(1 - |x[b,p] - tx(t)|) * relu(1 - |y[b,p] - ty(t)|)

The hat product is EXACTLY bilinear interpolation with zero padding
(``torch.nn.functional.grid_sample(align_corners=True, padding_mode="zeros")``
semantics, reference src/v1t/models/readout/gaussian2d.py:270): in-cell
offsets reproduce the corner weights, and out-of-range coordinates get zero
weight without any explicit masking. A is built on the VPU per (token,
point-chunk) tile in VMEM and contracted on the MXU; the backward w.r.t.
the table is the SAME structure transposed (a matmul, not a scatter), and
the gradient w.r.t. the sampling locations uses the cell-wise derivative
matrices dA/dx, dA/dy (compare-based, matching torch's piecewise-linear
grid gradient).

Layout: everything is CHANNEL-major — the table comes in as (B, C, H*W)
(exactly the core's output layout, no transpose) and samples come out as
(B, C, P). With C=155 in the matmuls' M dimension the MXU pads rows to the
sublane granularity (160) instead of padding lanes to 256, i.e. ~40% fewer
MACs than the token-major orientation; the token axis pads to a lane tile
(1664 for V1T's 1653) rather than a chunk multiple. The backward computes
d(table) and d(grid) in ONE kernel sharing the hat-weight builds.

Numerics: A is cast to bf16 for the MXU (fp32 accumulation) — error is the
same order as the bf16 feature values themselves, so this path is gated to
bf16 compute ("auto" dispatch in the readout); fp32 runs keep the exact XLA
gather path in v1t_tpu/ops/grid_sample.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from v1t_tpu.ops.common import pallas_call as _pallas_call

import os as _os

P_CHUNK = int(_os.environ.get("V1T_INTERP_P_CHUNK") or 0) or 1024
# experiment knob (misc/bench_readout.py): 1 replaces the hat build with a
# broadcast — WRONG results, measures the matmul-only floor
_ABLATE_HATS = _os.environ.get("V1T_INTERP_ABLATE", "") == "1"
if _ABLATE_HATS:  # a leaked env var must not corrupt a run silently
    import sys as _sys

    print(
        "WARNING: V1T_INTERP_ABLATE=1 — the readout forward kernel is "
        "running the hat-build ABLATION and produces WRONG outputs (bench "
        "knob, misc/bench_readout.py). Unset it for real runs.",
        file=_sys.stderr,
        flush=True,
    )

# the kernels keep the whole (C, T) table resident in VMEM plus ~5 live
# (T, P_CHUNK) fp32 hat/derivative matrices in the merged backward
# (~11 KB per table row at C=155) — beyond this cap (e.g. full-resolution
# 34k-token feature maps) callers must use the XLA gather path
MAX_TABLE_ROWS = 4096


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hat(coord, tcoord):
    """relu(1 - |coord - t|): the bilinear weight of grid row/col ``t`` for a
    sampling coordinate, zero outside the two adjacent cells."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord - tcoord))


def _txy(shape, width: int, dim: int):
    """(tx, ty) integer pixel coordinates of table row t = y*width + x,
    enumerated by broadcasted iota along ``dim``."""
    t = jax.lax.broadcasted_iota(jnp.int32, shape, dim)
    return t % width, t // width


def _txy_col(tp: int, width: int):
    """Column-vector (tp, 1) fp32 pixel coordinates: the mod/div/cast run
    once per table row instead of once per (row, point) element — the
    following hat builds broadcast them across the point lanes."""
    t = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    return (t % width).astype(jnp.float32), (t // width).astype(jnp.float32)


def _fwd_kernel(xs_ref, ys_ref, flat_ref, out_ref, *, width: int):
    xs = xs_ref[0, 0]  # (P_CHUNK,)
    ys = ys_ref[0, 0]
    tp = flat_ref.shape[2]
    # A^T: (tp, P_CHUNK), tokens along sublanes
    if _ABLATE_HATS:
        at = jnp.broadcast_to(xs[None, :] * 1e-9, (tp, xs.shape[0]))
    else:
        txf, tyf = _txy_col(tp, width)
        at = _hat(xs[None, :], txf) * _hat(ys[None, :], tyf)
    out = jax.lax.dot(
        flat_ref[0], at.astype(flat_ref.dtype),
        preferred_element_type=jnp.float32,
    )  # (C, tp) @ (tp, P_CHUNK)
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(
    xs_ref, ys_ref, flat_ref, dout_ref,
    dgx_ref, dgy_ref, dflat_ref,
    dflat_scr,
    *, width: int, np_chunks: int,
):
    """One pass per (batch, point-chunk): accumulates the table gradient
    (d flat = dout @ A^T, a matmul in place of XLA's 4 corner scatters) and
    computes the grid gradient from the cell-wise derivative matrices —
    d/dx bilinear = v(ix0+1) - v(ix0) inside the floor cell, scaled by the
    other axis's hat weight (torch's piecewise-linear grid gradient). The
    hat builds are shared between the two."""
    pi = pl.program_id(1)

    @pl.when(pi == 0)
    def _init():
        dflat_scr[...] = jnp.zeros_like(dflat_scr)

    xs = xs_ref[0, 0]
    ys = ys_ref[0, 0]
    tp = flat_ref.shape[2]
    txf, tyf = _txy_col(tp, width)
    hat_x = _hat(xs[None, :], txf)
    hat_y = _hat(ys[None, :], tyf)
    at = hat_x * hat_y  # (tp, P_CHUNK)

    do = dout_ref[0]  # (C, P_CHUNK)
    dflat_scr[...] += jax.lax.dot_general(
        do, at.astype(do.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (C, tp)

    # grid gradient via ONE channel-contraction (the dt-form "lane-lane"
    # orientation, ~2x the other matmuls' rate) instead of the two
    # token-contraction matmuls (flat @ dax, flat @ day) it replaces:
    #   dgx[p] = sum_c do[c,p] * sum_t flat[c,t] dax[t,p]
    #          = sum_t dax[t,p] * G[t,p],  G = flat^T do
    # and dax = sign_x * hat_y factors into VPU selects on hat*G products.
    flat = flat_ref[0]
    g = jax.lax.dot_general(
        flat, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (tp, P_CHUNK)
    ix0 = jnp.floor(xs)[None, :]
    iy0 = jnp.floor(ys)[None, :]
    wx = hat_y * g  # dax slot: sign over x within the floor cell
    wy = hat_x * g
    zero = jnp.zeros_like(g)
    dgx = jnp.sum(
        jnp.where(txf == ix0 + 1.0, wx, zero)
        - jnp.where(txf == ix0, wx, zero),
        axis=0,
    )
    dgy = jnp.sum(
        jnp.where(tyf == iy0 + 1.0, wy, zero)
        - jnp.where(tyf == iy0, wy, zero),
        axis=0,
    )
    dgx_ref[0, 0] = dgx
    dgy_ref[0, 0] = dgy

    @pl.when(pi == np_chunks - 1)
    def _emit():
        dflat_ref[0] = dflat_scr[...].astype(dflat_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _interp_core(static, flat_pad, xs, ys):
    out, _ = _interp_fwd(static, flat_pad, xs, ys)
    return out


def _interp_fwd(static, flat_pad, xs, ys):
    width, out_dtype = static
    b, c, tp = flat_pad.shape
    pp = xs.shape[2]
    out = _pallas_call(
        functools.partial(_fwd_kernel, width=width),
        grid=(b, pp // P_CHUNK),
        in_specs=[
            pl.BlockSpec((1, 1, P_CHUNK), lambda bi, pi: (bi, 0, pi)),
            pl.BlockSpec((1, 1, P_CHUNK), lambda bi, pi: (bi, 0, pi)),
            pl.BlockSpec((1, c, tp), lambda bi, pi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, P_CHUNK), lambda bi, pi: (bi, 0, pi)),
        out_shape=jax.ShapeDtypeStruct((b, c, pp), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(xs, ys, flat_pad)
    return out, (flat_pad, xs, ys)


def _interp_bwd(static, residuals, dout):
    width, _ = static
    flat_pad, xs, ys = residuals
    b, c, tp = flat_pad.shape
    pp = xs.shape[2]
    dout = dout.astype(flat_pad.dtype)

    dgx, dgy, dflat = _pallas_call(
        functools.partial(_bwd_kernel, width=width, np_chunks=pp // P_CHUNK),
        grid=(b, pp // P_CHUNK),
        in_specs=[
            pl.BlockSpec((1, 1, P_CHUNK), lambda bi, pi: (bi, 0, pi)),
            pl.BlockSpec((1, 1, P_CHUNK), lambda bi, pi: (bi, 0, pi)),
            pl.BlockSpec((1, c, tp), lambda bi, pi: (bi, 0, 0)),
            pl.BlockSpec((1, c, P_CHUNK), lambda bi, pi: (bi, 0, pi)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, P_CHUNK), lambda bi, pi: (bi, 0, pi)),
            pl.BlockSpec((1, 1, P_CHUNK), lambda bi, pi: (bi, 0, pi)),
            pl.BlockSpec((1, c, tp), lambda bi, pi: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, pp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, pp), jnp.float32),
            jax.ShapeDtypeStruct((b, c, tp), flat_pad.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((c, tp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(xs, ys, flat_pad, dout)
    return dflat, dgx, dgy


_interp_core.defvjp(_interp_fwd, _interp_bwd)


def interp_matmul_sample_cm(
    flat_cm: jax.Array,
    grid: jax.Array,
    height: int,
    width: int,
) -> jax.Array:
    """Bilinear sampling of a channel-major table via structured matmuls.

    flat_cm (B, C, H*W) — the core output layout; grid (B, P, 2) normalized
    to [-1, 1] with align_corners=True and zero padding; returns (B, C, P).
    """
    assert flat_cm.ndim == 3 and grid.ndim == 3 and grid.shape[-1] == 2
    b, c, t = flat_cm.shape
    p = grid.shape[1]
    if t > MAX_TABLE_ROWS:
        raise ValueError(
            f"interp_matmul: table of {t} rows exceeds the VMEM-resident cap "
            f"({MAX_TABLE_ROWS}); use grid_sample_tokens for this shape"
        )
    # pixel-space coordinates (align_corners=True: -1 -> 0, +1 -> size-1)
    xs = (grid[..., 0].astype(jnp.float32) + 1.0) * 0.5 * (width - 1)
    ys = (grid[..., 1].astype(jnp.float32) + 1.0) * 0.5 * (height - 1)

    pp = _round_up(p, P_CHUNK)
    tp = _round_up(t, 128)
    # padded points get coordinates far outside every hat's support (their
    # columns of A are exactly zero); padded table rows are zero-valued,
    # which reproduces zero padding for y slightly past the last row
    xs = jnp.pad(xs, ((0, 0), (0, pp - p)), constant_values=-1e9)[:, None]
    ys = jnp.pad(ys, ((0, 0), (0, pp - p)), constant_values=-1e9)[:, None]
    flat_pad = jnp.pad(flat_cm, ((0, 0), (0, 0), (0, tp - t)))

    static = (width, flat_cm.dtype)
    from v1t_tpu.parallel.kernel_sharding import call_kernel

    out = call_kernel(
        _interp_core, static, (flat_pad, xs, ys), batched=(0, 1, 2)
    )
    return out[:, :, :p]


def interp_matmul_sample(
    flat: jax.Array,
    grid: jax.Array,
    height: int,
    width: int,
) -> jax.Array:
    """Token-major convenience wrapper: flat (B, H*W, C) -> (B, P, C).

    Same contract as ``grid_sample_tokens(..., mode="bilinear")``. Model
    code should prefer ``interp_matmul_sample_cm`` (the core output is
    already channel-major — both transposes here are avoidable).
    """
    out = interp_matmul_sample_cm(
        jnp.swapaxes(flat, 1, 2), grid, height=height, width=width
    )
    return jnp.swapaxes(out, 1, 2)
