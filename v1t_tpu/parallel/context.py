"""Ambient sequence-parallel context.

The ViT core's Attention module is a plain flax module built from the typed
Config; the device Mesh only exists at runtime. The trainer (or any driver)
registers the active mesh here and the Attention module routes its attention
through v1t_tpu/parallel/sequence.py when a "seq" axis is present. The
knobs themselves (``--sequence_parallel`` / ``--sequence_parallel_impl``)
live in Config and are therefore captured by args.yaml replay; this registry
only carries the unpicklable Mesh handle.
"""

from __future__ import annotations

import typing as t

_state: dict = {"mesh": None, "axis": None, "impl": "allgather",
                "batch_axis": None}


def set_sequence_mesh(
    mesh,
    axis: str = "seq",
    impl: str = "allgather",
    batch_axis: t.Optional[str] = None,
) -> None:
    """Register (or clear, with mesh=None) the active sequence-parallel
    mesh."""
    if impl not in ("allgather", "ring"):
        raise ValueError(f"unknown sequence-parallel impl {impl!r}")
    _state.update(mesh=mesh, axis=axis, impl=impl, batch_axis=batch_axis)


def sequence_mesh():
    """Returns (mesh, axis, impl, batch_axis) or None when inactive."""
    if _state["mesh"] is None:
        return None
    return (_state["mesh"], _state["axis"], _state["impl"],
            _state["batch_axis"])
