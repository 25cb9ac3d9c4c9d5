"""Batch-axis sharding for the Pallas kernels under a device mesh.

A ``pallas_call`` has no GSPMD partitioning rule: under plain ``jit`` over a
multi-device mesh, XLA would all-gather the batch-sharded operands onto every
device and run the kernel replicated — silently destroying the data-parallel
speedup (or failing to compile). The reference has no counterpart (it is
single-device, SURVEY.md §2.12); this layer is what makes the TPU-native
fused kernels compose with the BASELINE north star's DP-over-ICI training.

Design: every kernel's custom-VJP core (``_mha_core`` / ``_mlp_core`` /
``_flash_core`` / ``_interp_core``) is batch-parallel — grid dimension 0 maps
over the batch with no cross-batch reduction. So each call site wraps the
core in ``jax.shard_map`` over the mesh's batch axis: batch-leading operands
shard on dim 0, parameters/seeds replicate, and the kernel runs on its local
shard on every device. GSPMD handles the REST of the graph around the opaque
shard_map region — including the automatic gradient all-reduce where
replicated parameters meet batch-sharded activation cotangents.

The active mesh is registered ambiently (like the sequence-parallel context,
``v1t_tpu/parallel/context.py``): the Trainer sets it around every jitted
step call (it is read at trace time), so plain single-device runs pay
nothing. ``suspend()`` masks the registry while tracing the body of an outer
``shard_map`` (the sequence-parallel attention), where a nested shard_map
over the same mesh would be invalid — kernels invoked there already see
per-device local shapes.
"""

from __future__ import annotations

import contextlib
import typing as t

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

_state: dict = {"mesh": None, "axis": None, "suspended": 0}

# distinct per-shard dropout streams: the in-kernel PRNG draws from
# (seed, block uid), so without an offset every shard would reuse the same
# mask for its local sample at the same block coordinates
_SEED_STRIDE = 0x5851F42D  # large odd constant, int32-representable


def set_data_mesh(mesh, axis: str = "data") -> None:
    """Register (or clear, with mesh=None) the ambient data-parallel mesh."""
    _state.update(mesh=mesh, axis=axis)


def data_mesh():
    """Returns (mesh, axis) or None when inactive/suspended."""
    if _state["mesh"] is None or _state["suspended"]:
        return None
    return (_state["mesh"], _state["axis"])


@contextlib.contextmanager
def activate(mesh, axis: str = "data"):
    """Scoped ``set_data_mesh`` — the Trainer wraps every jitted step call so
    ambient state cannot leak between a meshed and an unmeshed Trainer in
    the same process."""
    prev = (_state["mesh"], _state["axis"])
    _state.update(mesh=mesh, axis=axis)
    try:
        yield
    finally:
        _state.update(mesh=prev[0], axis=prev[1])


@contextlib.contextmanager
def suspend():
    """Mask the registry while tracing the body of an outer shard_map."""
    _state["suspended"] += 1
    try:
        yield
    finally:
        _state["suspended"] -= 1


def call_kernel(
    core_fn: t.Callable,
    static_cfg,
    operands: t.Tuple[jax.Array, ...],
    batched: t.Tuple[int, ...],
    seed_index: t.Optional[int] = None,
):
    """Invoke ``core_fn(static_cfg, *operands)``, sharded over the ambient
    data mesh's batch axis when one is active.

    Args:
        core_fn: a custom-VJP kernel core with signature
            ``(static_cfg, *arrays) -> array`` whose grid is batch-parallel
            over dim 0 of the ``batched`` operands.
        operands: positional array operands (no statics).
        batched: indices of operands sharded on their leading axis; all
            other operands are replicated.
        seed_index: index of the (1,) int32 dropout-seed operand; each shard
            offsets it by ``axis_index * _SEED_STRIDE`` so dropout masks
            decorrelate across shards (skipped on 1-device meshes, keeping
            mesh runs bit-identical to unmeshed runs).
    """
    ctx = data_mesh()
    if ctx is None:
        return core_fn(static_cfg, *operands)
    mesh, axis = ctx
    size = mesh.shape[axis]
    for i in batched:
        if operands[i].shape[0] % size != 0:
            raise ValueError(
                f"kernel operand {i} batch dim {operands[i].shape[0]} not "
                f"divisible by mesh axis {axis!r} size {size}"
            )

    def body(*ops):
        ops = list(ops)
        if seed_index is not None and size > 1:
            idx = jax.lax.axis_index(axis).astype(jnp.int32)
            ops[seed_index] = ops[seed_index] + idx * jnp.int32(_SEED_STRIDE)
        with suspend():
            return core_fn(static_cfg, *ops)

    in_specs = tuple(
        P(axis) if i in batched else P() for i in range(len(operands))
    )
    return shard_map(
        body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(axis),
        check_vma=False,
    )(*operands)
