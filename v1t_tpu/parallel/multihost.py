"""Multi-host bootstrap (SURVEY §5.8): jax.distributed over DCN with
host-local data feeding.

On a multi-host slice each process sees only its local devices; batches are
assembled per host and stitched into global arrays with
``jax.make_array_from_process_local_data``. Single-process runs are a no-op
so the same code path works everywhere.
"""

from __future__ import annotations

import typing as t

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: t.Optional[str] = None,
    num_processes: t.Optional[int] = None,
    process_id: t.Optional[int] = None,
):
    """Initialize jax.distributed when running multi-process; silently a
    no-op for single-process runs (the common single-host case)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_name: str = "data") -> Mesh:
    """1-D mesh over every device in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), axis_names=(axis_name,))


def host_local_batch_to_global(
    mesh: Mesh, batch: t.Dict[str, np.ndarray]
) -> dict:
    """Stitch per-host numpy batches into globally-sharded arrays.

    Each process passes its LOCAL shard (global_batch / num_processes rows);
    the returned jax.Arrays are globally addressable and sharded over the
    mesh's data axis — the multi-host equivalent of DataParallel.shard_batch.
    """
    out = {}
    for key, value in batch.items():
        if not isinstance(value, np.ndarray):
            out[key] = value
            continue
        spec = P("data", *([None] * (value.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        out[key] = jax.make_array_from_process_local_data(sharding, value)
    return out
