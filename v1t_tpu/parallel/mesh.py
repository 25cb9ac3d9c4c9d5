"""Device-mesh / sharding layer: data-parallel training over ICI.

The reference is strictly single-device (SURVEY.md §2.12 — no DDP, no
collectives; the sole ``import torch.distributed`` is dead code). This module
supplies the TPU-native capability the BASELINE north star requires:
batch-axis sharding over a 1-D ``Mesh(("data",))`` with XLA inserting the
gradient all-reduce over ICI automatically.

Design: GSPMD-style — parameters/optimizer state are replicated
(``P()``), batches are sharded on the leading axis (``P("data", ...)``), and
the jitted train step is compiled against those input shardings. Because the
loss is a SUM over samples (reference losses.py semantics), per-shard partial
sums all-reduce to exactly the single-device loss; gradients likewise. The
mesh axis layout keeps a "model" axis extension point for future
tensor/sequence sharding of the 1654-token attention (SURVEY.md §5.7).
"""

from __future__ import annotations

import typing as t

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class DataParallel:
    """1-D data-parallel mesh wrapper used by the Trainer."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.replicated = NamedSharding(mesh, P())

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    @property
    def data_size(self) -> int:
        """Size of the batch-sharding axis (the full mesh unless a seq axis
        carves devices out)."""
        return self.mesh.shape["data"]

    @classmethod
    def create(
        cls,
        num_devices: t.Optional[int] = None,
        devices: t.Optional[t.Sequence[jax.Device]] = None,
        sequence_parallel: int = 0,
    ) -> t.Optional["DataParallel"]:
        """Build the mesh; returns None when only one device is in play
        (plain single-device jit is then used).

        ``sequence_parallel`` > 1 carves a "seq" axis out of the devices:
        the mesh becomes ("data", "seq") of shape
        (num_devices // sequence_parallel, sequence_parallel) — attention
        tokens shard over "seq" (v1t_tpu/parallel/sequence.py) while the
        batch shards over "data"."""
        if devices is None:
            devices = jax.devices()
        if num_devices:
            devices = devices[:num_devices]
        if len(devices) <= 1:
            return None
        if sequence_parallel and sequence_parallel > 1:
            assert len(devices) % sequence_parallel == 0, (
                f"{len(devices)} devices not divisible by "
                f"sequence_parallel={sequence_parallel}"
            )
            grid = np.asarray(devices).reshape(
                len(devices) // sequence_parallel, sequence_parallel
            )
            mesh = Mesh(grid, axis_names=("data", "seq"))
        else:
            mesh = Mesh(np.asarray(devices), axis_names=("data",))
        return cls(mesh)

    @property
    def seq_axis(self) -> t.Optional[str]:
        return "seq" if "seq" in self.mesh.axis_names else None

    def replicate(self, tree):
        return jax.device_put(tree, self.replicated)

    def _batch_sharding(self, ndim: int) -> NamedSharding:
        return NamedSharding(self.mesh, P("data", *([None] * (ndim - 1))))

    def shard_batch(self, arrays: t.Dict[str, np.ndarray]) -> dict:
        if jax.process_count() > 1:
            # multi-host: each process passes its HOST-LOCAL rows; stitch
            # them into globally-sharded arrays (parallel/multihost.py)
            from v1t_tpu.parallel.multihost import host_local_batch_to_global

            return host_local_batch_to_global(self.mesh, arrays)
        out = {}
        for k, v in arrays.items():
            assert v.shape[0] % self.data_size == 0, (
                f"batch dim {v.shape[0]} not divisible by data-axis size "
                f"{self.data_size} for {k!r}"
            )
            out[k] = jax.device_put(v, self._batch_sharding(v.ndim))
        return out

    def shard_mask(self, mask: np.ndarray):
        if jax.process_count() > 1:
            from v1t_tpu.parallel.multihost import host_local_batch_to_global

            return host_local_batch_to_global(self.mesh, {"mask": mask})["mask"]
        return jax.device_put(mask, self._batch_sharding(1))

    def step_shardings(self) -> dict:
        """jit kwargs for the train step — shardings are carried by the
        committed inputs (GSPMD propagates them), so nothing explicit is
        needed; kept as an extension hook for model-axis sharding."""
        return {}
