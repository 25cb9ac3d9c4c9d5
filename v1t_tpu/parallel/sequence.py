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


def _local_attention(q, k, v, scale, use_lsa, q_offset, k_offset,
                     n_real=None, dropout_rate=0.0, dropout_key=None):
    """Plain attention on local q against a block of k/v, returning the
    un-normalized accumulator plus softmax statistics (m, l) so partial
    results can be combined exactly. ``n_real`` masks keys past the true
    sequence length (token padding to the shard-count multiple).

    Attention-probability dropout matches the flash kernel's semantics:
    ``l`` is computed from the UNdropped probabilities (so the softmax
    normalization is exact) and the dropped/rescaled probabilities feed the
    value accumulation only."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if use_lsa or n_real is not None:
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape[-2:], 0) + q_offset
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape[-2:], 1) + k_offset
        if n_real is not None:
            s = jnp.where(cols >= n_real, MASK_VALUE, s)
        if use_lsa:
            s = jnp.where(rows == cols, MASK_VALUE, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0 and dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
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
    n_real: t.Optional[int] = None,
    batch_axis: t.Optional[str] = None,
    dropout_rate: float = 0.0,
    rng: t.Optional[jax.Array] = None,
):
    """Sequence-sharded attention: all-gather K/V, attend locally.
    q, k, v: (B, H, N, D) sharded on the N axis over ``axis`` (and
    optionally on the batch axis over ``batch_axis`` for DP x SP meshes);
    ``n_real`` masks token padding."""
    n_shards = mesh.shape[axis]
    n_local = q.shape[2] // n_shards

    def body(q_s, k_s, v_s):
        from v1t_tpu.parallel.kernel_sharding import suspend

        with suspend():  # already inside a shard_map — no nested wrapping
            idx = jax.lax.axis_index(axis)
            key = None
            if rng is not None and dropout_rate > 0.0:
                key = jax.random.fold_in(rng, idx)
                if batch_axis is not None:
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index(batch_axis)
                    )
            k_full = jax.lax.all_gather(k_s, axis, axis=2, tiled=True)
            v_full = jax.lax.all_gather(v_s, axis, axis=2, tiled=True)
            acc, m, l = _local_attention(
                q_s, k_full, v_full, scale, use_lsa,
                q_offset=idx * n_local, k_offset=0, n_real=n_real,
                dropout_rate=dropout_rate, dropout_key=key,
            )
            l = jnp.where(l == 0.0, 1.0, l)
            return (acc / l).astype(q_s.dtype)

    spec = P(batch_axis, None, axis, None)
    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale,
    mesh: Mesh,
    axis: str = "seq",
    use_lsa: bool = False,
    n_real: t.Optional[int] = None,
    batch_axis: t.Optional[str] = None,
    dropout_rate: float = 0.0,
    rng: t.Optional[jax.Array] = None,
):
    """Ring attention: K/V blocks rotate around the ring via ppermute while
    each shard attends its local queries; partial softmax statistics combine
    online. Communication is point-to-point and overlaps with compute."""
    n_shards = mesh.shape[axis]
    n_local = q.shape[2] // n_shards

    def body(q_s, k_s, v_s):
        from v1t_tpu.parallel.kernel_sharding import suspend

        with suspend():  # already inside a shard_map — no nested wrapping
            return _ring_body(q_s, k_s, v_s)

    def _ring_body(q_s, k_s, v_s):
        idx = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

        def step(carry, step_idx):
            acc, m, l, k_blk, v_blk = carry
            src = (idx - step_idx) % n_shards  # who this block came from
            key = None
            if rng is not None and dropout_rate > 0.0:
                # deterministic per (query shard, key block) pair
                key = jax.random.fold_in(rng, idx * n_shards + src)
                if batch_axis is not None:
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index(batch_axis)
                    )
            blk_acc, blk_m, blk_l = _local_attention(
                q_s, k_blk, v_blk, scale, use_lsa,
                q_offset=idx * n_local, k_offset=src * n_local,
                n_real=n_real, dropout_rate=dropout_rate, dropout_key=key,
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
        # fully-masked rows (token padding) have l == 0
        l = jnp.where(l == 0.0, 1.0, l)
        return (acc / l).astype(q_s.dtype)

    spec = P(batch_axis, None, axis, None)
    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
