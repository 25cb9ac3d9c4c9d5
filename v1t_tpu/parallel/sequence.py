"""Context (sequence) parallelism for the V1T attention — the SURVEY §5.7
extension point that single-chip parity does not require but full-resolution
(144x256 -> 34,114-token) training does.

Tokens are sharded over a "seq" mesh axis. Two implementations over
``shard_map``:

- ``allgather_attention``: all-gather K/V across the axis, attend locally —
  one collective, simplest, right for moderate shard counts.
- ``ring_attention``: rotate K/V blocks around the ring with
  ``jax.lax.ppermute``, combining partial softmax statistics online —
  point-to-point ICI traffic overlapped with compute; right for long
  sequences on larger meshes.

Both are numerically exact (online-softmax combination) and differentiable
through standard JAX autodiff of the shard_map body. LSA's diagonal mask is
supported by passing global position offsets.
"""

from __future__ import annotations

import functools
import typing as t

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _local_attention(q, k, v, scale, use_lsa, q_offset, k_offset):
    """Plain attention on local q against a block of k/v, returning the
    un-normalized accumulator plus softmax statistics (m, l) so partial
    results can be combined exactly."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if use_lsa:
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape[-2:], 0) + q_offset
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape[-2:], 1) + k_offset
        s = jnp.where(rows == cols, MASK_VALUE, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum(
        "bhnm,bhmd->bhnd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return acc, m, l


def _combine(acc1, m1, l1, acc2, m2, l2):
    """Online-softmax combination of two partial attention results."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    acc = acc1 * a1 + acc2 * a2
    l = l1 * a1 + l2 * a2
    return acc, m, l


def allgather_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale,
    mesh: Mesh,
    axis: str = "seq",
    use_lsa: bool = False,
):
    """Sequence-sharded attention: all-gather K/V, attend locally.
    q, k, v: (B, H, N, D) sharded on the N axis over ``axis``."""
    n_shards = mesh.shape[axis]
    n_local = q.shape[2] // n_shards

    def body(q_s, k_s, v_s):
        idx = jax.lax.axis_index(axis)
        k_full = jax.lax.all_gather(k_s, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_s, axis, axis=2, tiled=True)
        acc, m, l = _local_attention(
            q_s, k_full, v_full, scale, use_lsa,
            q_offset=idx * n_local, k_offset=0,
        )
        return (acc / l).astype(q_s.dtype)

    spec = P(None, None, axis, None)
    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False,
    )(q, k, v)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale,
    mesh: Mesh,
    axis: str = "seq",
    use_lsa: bool = False,
):
    """Ring attention: K/V blocks rotate around the ring via ppermute while
    each shard attends its local queries; partial softmax statistics combine
    online. Communication is point-to-point and overlaps with compute."""
    n_shards = mesh.shape[axis]
    n_local = q.shape[2] // n_shards

    def body(q_s, k_s, v_s):
        idx = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

        def step(carry, step_idx):
            acc, m, l, k_blk, v_blk = carry
            src = (idx - step_idx) % n_shards  # who this block came from
            blk_acc, blk_m, blk_l = _local_attention(
                q_s, k_blk, v_blk, scale, use_lsa,
                q_offset=idx * n_local, k_offset=src * n_local,
            )
            acc, m, l = _combine(acc, m, l, blk_acc, blk_m, blk_l)
            k_blk = jax.lax.ppermute(k_blk, axis, perm)
            v_blk = jax.lax.ppermute(v_blk, axis, perm)
            return (acc, m, l, k_blk, v_blk), None

        b, h, n_loc, d = q_s.shape
        init = (
            jnp.zeros((b, h, n_loc, d), jnp.float32),
            jnp.full((b, h, n_loc, 1), MASK_VALUE, jnp.float32),
            jnp.zeros((b, h, n_loc, 1), jnp.float32),
            k_s,
            v_s,
        )
        (acc, m, l, _, _), _ = jax.lax.scan(
            step, init, jnp.arange(n_shards)
        )
        return (acc / l).astype(q_s.dtype)

    spec = P(None, None, axis, None)
    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False,
    )(q, k, v)
