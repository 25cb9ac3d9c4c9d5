"""MXU-based bilinear interpolation for the Gaussian2d readout.

TPU has no hardware gather/scatter: XLA lowers the readout's per-neuron
bilinear sampling (4 corner gathers of (B, N) points from a (B, H*W, C)
table) onto slow serialized paths — profiled at V1T batch 64, the forward
gathers cost ~15 ms/step and the 4 backward corner *scatters* ~30 ms/step,
making the readout the second-largest step component after attention.

This module reformulates sampling as dense structured matmuls:

    out[b, p, c] = sum_t A[b, p, t] * flat[b, t, c]
    A[b, p, t]   = relu(1 - |x[b,p] - tx(t)|) * relu(1 - |y[b,p] - ty(t)|)

The hat product is EXACTLY bilinear interpolation with zero padding
(``torch.nn.functional.grid_sample(align_corners=True, padding_mode="zeros")``
semantics, reference src/v1t/models/readout/gaussian2d.py:270): in-cell
offsets reproduce the corner weights, and out-of-range coordinates get zero
weight without any explicit masking. A is built on the VPU per (point-chunk,
token) tile in VMEM and contracted on the MXU — the backward w.r.t. the
table is the SAME structure transposed (a matmul, not a scatter), and the
gradient w.r.t. the sampling locations uses the cell-wise derivative
matrices dA/dx, dA/dy (compare-based, matching torch's piecewise-linear
grid gradient).

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

P_CHUNK = 512    # points per forward/dgrid program
T_CHUNK = 256    # table rows per dflat program


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hat(coord, tcoord):
    """relu(1 - |coord - t|): the bilinear weight of grid row/col ``t`` for a
    sampling coordinate, zero outside the two adjacent cells."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord - tcoord))


def _txy(shape, width: int, dim: int, offset=0):
    """(tx, ty) integer pixel coordinates of table row t = y*width + x,
    enumerated by broadcasted iota along ``dim``."""
    t = jax.lax.broadcasted_iota(jnp.int32, shape, dim) + offset
    return t % width, t // width


def _fwd_kernel(xs_ref, ys_ref, flat_ref, out_ref, *, width: int):
    xs = xs_ref[0, 0]  # (P_CHUNK,)
    ys = ys_ref[0, 0]
    tp = flat_ref.shape[1]
    tx, ty = _txy((xs.shape[0], tp), width, dim=1)
    a = _hat(xs[:, None], tx.astype(jnp.float32)) * _hat(
        ys[:, None], ty.astype(jnp.float32)
    )
    out = jax.lax.dot(
        a.astype(flat_ref.dtype), flat_ref[0],
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _dflat_kernel(xs_ref, ys_ref, dout_ref, dflat_ref, *, width: int):
    ti = pl.program_id(1)
    t_chunk = dflat_ref.shape[1]
    xs = xs_ref[0]  # (1, Pp)
    ys = ys_ref[0]
    tx, ty = _txy(
        (t_chunk, xs.shape[1]), width, dim=0, offset=ti * t_chunk
    )
    at = _hat(xs, tx.astype(jnp.float32)) * _hat(ys, ty.astype(jnp.float32))
    dflat = jax.lax.dot(
        at.astype(dout_ref.dtype), dout_ref[0],
        preferred_element_type=jnp.float32,
    )
    dflat_ref[0] = dflat.astype(dflat_ref.dtype)


def _dgrid_kernel(
    xs_ref, ys_ref, flat_ref, dout_ref, dgx_ref, dgy_ref, *, width: int
):
    """Cell-wise grid gradient: d/dx bilinear = v(ix0+1) - v(ix0) inside the
    floor cell (independent of the in-cell offset), scaled by the other
    axis's hat weight — matching torch's piecewise-linear grid gradient."""
    xs = xs_ref[0, 0]
    ys = ys_ref[0, 0]
    tp = flat_ref.shape[1]
    shape = (xs.shape[0], tp)
    tx, ty = _txy(shape, width, dim=1)
    hat_x = _hat(xs[:, None], tx.astype(jnp.float32))
    hat_y = _hat(ys[:, None], ty.astype(jnp.float32))
    ix0 = jnp.floor(xs)[:, None].astype(jnp.int32)
    iy0 = jnp.floor(ys)[:, None].astype(jnp.int32)
    sign_x = jnp.where(
        tx == ix0 + 1, 1.0, jnp.where(tx == ix0, -1.0, 0.0)
    )
    sign_y = jnp.where(
        ty == iy0 + 1, 1.0, jnp.where(ty == iy0, -1.0, 0.0)
    )
    dax = sign_x * hat_y
    day = hat_x * sign_y
    flat = flat_ref[0]
    do = dout_ref[0].astype(jnp.float32)
    sx = jax.lax.dot(
        dax.astype(flat.dtype), flat, preferred_element_type=jnp.float32
    )  # (P_CHUNK, C)
    sy = jax.lax.dot(
        day.astype(flat.dtype), flat, preferred_element_type=jnp.float32
    )
    dgx_ref[0, 0] = jnp.sum(sx * do, axis=1)
    dgy_ref[0, 0] = jnp.sum(sy * do, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _interp_core(static, flat_pad, xs, ys):
    out, _ = _interp_fwd(static, flat_pad, xs, ys)
    return out


def _interp_fwd(static, flat_pad, xs, ys):
    width, out_dtype = static
    b, tp, c = flat_pad.shape
    pp = xs.shape[2]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, width=width),
        grid=(b, pp // P_CHUNK),
        in_specs=[
            pl.BlockSpec((1, 1, P_CHUNK), lambda bi, pi: (bi, 0, pi)),
            pl.BlockSpec((1, 1, P_CHUNK), lambda bi, pi: (bi, 0, pi)),
            pl.BlockSpec((1, tp, c), lambda bi, pi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, P_CHUNK, c), lambda bi, pi: (bi, pi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, pp, c), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(xs, ys, flat_pad)
    return out, (flat_pad, xs, ys)


def _interp_bwd(static, residuals, dout):
    width, _ = static
    flat_pad, xs, ys = residuals
    b, tp, c = flat_pad.shape
    pp = xs.shape[2]
    dout = dout.astype(flat_pad.dtype)

    dflat = pl.pallas_call(
        functools.partial(_dflat_kernel, width=width),
        grid=(b, tp // T_CHUNK),
        in_specs=[
            pl.BlockSpec((1, 1, pp), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((1, 1, pp), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((1, pp, c), lambda bi, ti: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T_CHUNK, c), lambda bi, ti: (bi, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((b, tp, c), flat_pad.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(xs, ys, dout)

    dgx, dgy = pl.pallas_call(
        functools.partial(_dgrid_kernel, width=width),
        grid=(b, pp // P_CHUNK),
        in_specs=[
            pl.BlockSpec((1, 1, P_CHUNK), lambda bi, pi: (bi, 0, pi)),
            pl.BlockSpec((1, 1, P_CHUNK), lambda bi, pi: (bi, 0, pi)),
            pl.BlockSpec((1, tp, c), lambda bi, pi: (bi, 0, 0)),
            pl.BlockSpec((1, P_CHUNK, c), lambda bi, pi: (bi, pi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, P_CHUNK), lambda bi, pi: (bi, 0, pi)),
            pl.BlockSpec((1, 1, P_CHUNK), lambda bi, pi: (bi, 0, pi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, pp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, pp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(xs, ys, flat_pad, dout)
    return dflat, dgx, dgy


_interp_core.defvjp(_interp_fwd, _interp_bwd)


def interp_matmul_sample(
    flat: jax.Array,
    grid: jax.Array,
    height: int,
    width: int,
) -> jax.Array:
    """Bilinear sampling of a token-major table via structured matmuls.

    Same contract as ``grid_sample_tokens(..., mode="bilinear")``:
    flat (B, H*W, C), grid (B, P, 2) normalized to [-1, 1] with
    align_corners=True and zero padding; returns (B, P, C).
    """
    assert flat.ndim == 3 and grid.ndim == 3 and grid.shape[-1] == 2
    b, t, c = flat.shape
    p = grid.shape[1]
    # pixel-space coordinates (align_corners=True: -1 -> 0, +1 -> size-1)
    xs = (grid[..., 0].astype(jnp.float32) + 1.0) * 0.5 * (width - 1)
    ys = (grid[..., 1].astype(jnp.float32) + 1.0) * 0.5 * (height - 1)

    pp = _round_up(p, P_CHUNK)
    tp = _round_up(t, T_CHUNK)
    # padded points get coordinates far outside every hat's support (their
    # rows of A are exactly zero); padded table rows are zero-valued, which
    # reproduces zero padding for y slightly past the last row
    xs = jnp.pad(xs, ((0, 0), (0, pp - p)), constant_values=-1e9)[:, None]
    ys = jnp.pad(ys, ((0, 0), (0, pp - p)), constant_values=-1e9)[:, None]
    flat_pad = jnp.pad(flat, ((0, 0), (0, tp - t), (0, 0)))

    static = (width, flat.dtype)
    out = _interp_core(static, flat_pad, xs, ys)
    return out[:, :p, :]
