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

Each shard's local attention runs through the blocked flash kernel
(``flash_attention_with_lse``, O(N) memory — at 34k tokens the einsum path
would materialize a multi-GB (n_local, n) score slab) on TPU, with an exact
einsum fallback on other backends / under LSA. Partial results carry
(normalized out, log-sum-exp) and combine EXACTLY:

    out = sum_b out_b * exp(lse_b - logaddexp_b lse_b)

so both paths share one combination rule and are numerically exact and
differentiable (the flash kernel's LSE cotangent folds into its backward
delta). LSA's diagonal mask needs global position offsets that the kernel
does not model — LSA always takes the einsum path.
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_eligible(use_lsa: bool, dynamic_key_mask: bool) -> bool:
    """Trace-time dispatch: the Pallas kernel needs a TPU backend, cannot
    model LSA's globally-indexed diagonal, and its key masking is static —
    ring blocks with a traced global offset (token-pad tail) fall back."""
    return (
        not use_lsa
        and not dynamic_key_mask
        and jax.default_backend() == "tpu"
    )


def _fold_scale(q, scale):
    """Fold the softmax temperature into q: scale * (q k^T) == (scale q) k^T,
    and a learnable (per-head) LSA temperature differentiates through XLA."""
    scale = jnp.asarray(scale, jnp.float32)
    if scale.ndim == 1:  # per-head
        return q * scale[None, :, None, None].astype(q.dtype)
    return q * scale.astype(q.dtype)


def _einsum_block(q, k, v, use_lsa, q_offset, k_offset,
                  n_real=None, dropout_rate=0.0, dropout_key=None):
    """Exact attention of local q against one k/v block, returning the
    NORMALIZED output and row log-sum-exp. ``n_real`` masks keys past the
    true sequence length (global indexing via k_offset).

    Attention-probability dropout matches the flash kernel's semantics: the
    log-sum-exp comes from the UNdropped probabilities (exact softmax
    normalization); the dropped/rescaled probabilities feed the value
    accumulation only."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
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
    out = acc / jnp.where(l == 0.0, 1.0, l)
    lse = jnp.where(l == 0.0, MASK_VALUE, m + jnp.log(jnp.maximum(l, 1e-37)))
    return out, lse


def _flash_block(q, k, v, n_real=None, dropout_rate=0.0, dropout_key=None):
    """Blocked flash kernel on one (q_local, k-block) pair -> (out fp32,
    lse (b,h,n,1))."""
    from v1t_tpu.ops.flash_attention import flash_attention_with_lse

    out, lse = flash_attention_with_lse(
        q, k, v, n_real_k=n_real,
        dropout_rate=dropout_rate,
        deterministic=dropout_key is None or dropout_rate == 0.0,
        rng=dropout_key,
    )
    return out.astype(jnp.float32), lse[..., None]


def _combine_lse(o1, lse1, o2, lse2):
    """Exact combination of two normalized partial attentions via their
    log-sum-exps. Sentinel-empty rows carry lse = MASK_VALUE (finite), so no
    inf - inf NaNs arise."""
    lse = jnp.logaddexp(lse1, lse2)
    w1 = jnp.exp(lse1 - lse)
    w2 = jnp.exp(lse2 - lse)
    return o1 * w1 + o2 * w2, lse


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
    ``n_real`` masks token padding. ``scale`` must already be folded into q
    (the caller does this so LSA temperatures differentiate through XLA)."""
    n_shards = mesh.shape[axis]
    n_local = q.shape[2] // n_shards
    # the global key mask is static here (k_offset == 0 on every shard)
    use_flash = _flash_eligible(use_lsa, dynamic_key_mask=False)
    q = _fold_scale(q, scale)

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
            if use_flash:
                out, _ = _flash_block(
                    q_s, k_full, v_full, n_real=n_real,
                    dropout_rate=dropout_rate, dropout_key=key,
                )
            else:
                out, _ = _einsum_block(
                    q_s, k_full, v_full, use_lsa,
                    q_offset=idx * n_local, k_offset=0, n_real=n_real,
                    dropout_rate=dropout_rate, dropout_key=key,
                )
            return out.astype(q_s.dtype)

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
    each shard attends its local queries; normalized partial results combine
    online via their log-sum-exps. Communication is point-to-point and
    overlaps with compute."""
    n_shards = mesh.shape[axis]
    n_total = q.shape[2]
    n_local = n_total // n_shards
    # a ring block's global key offset is traced (depends on the rotation
    # step and shard index), so the token-pad tail mask would be dynamic —
    # only masked (padded) sequences fall back to the einsum path
    needs_tail_mask = n_real is not None and n_real != n_total
    use_flash = _flash_eligible(use_lsa, dynamic_key_mask=needs_tail_mask)
    q = _fold_scale(q, scale)

    def body(q_s, k_s, v_s):
        from v1t_tpu.parallel.kernel_sharding import suspend

        with suspend():  # already inside a shard_map — no nested wrapping
            return _ring_body(q_s, k_s, v_s)

    def _ring_body(q_s, k_s, v_s):
        idx = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

        def step(carry, step_idx):
            out, lse, k_blk, v_blk = carry
            src = (idx - step_idx) % n_shards  # who this block came from
            key = None
            if rng is not None and dropout_rate > 0.0:
                # deterministic per (query shard, key block) pair
                key = jax.random.fold_in(rng, idx * n_shards + src)
                if batch_axis is not None:
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index(batch_axis)
                    )
            if use_flash:
                blk_out, blk_lse = _flash_block(
                    q_s, k_blk, v_blk,
                    dropout_rate=dropout_rate, dropout_key=key,
                )
            else:
                blk_out, blk_lse = _einsum_block(
                    q_s, k_blk, v_blk, use_lsa,
                    q_offset=idx * n_local, k_offset=src * n_local,
                    n_real=n_real, dropout_rate=dropout_rate,
                    dropout_key=key,
                )
            out, lse = _combine_lse(out, lse, blk_out, blk_lse)
            k_blk = jax.lax.ppermute(k_blk, axis, perm)
            v_blk = jax.lax.ppermute(v_blk, axis, perm)
            return (out, lse, k_blk, v_blk), None

        b, h, n_loc, d = q_s.shape
        init = (
            jnp.zeros((b, h, n_loc, d), jnp.float32),
            jnp.full((b, h, n_loc, 1), MASK_VALUE, jnp.float32),
            k_s,
            v_s,
        )
        (out, lse, _, _), _ = jax.lax.scan(step, init, jnp.arange(n_shards))
        return out.astype(q_s.dtype)

    spec = P(batch_axis, None, axis, None)
    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
