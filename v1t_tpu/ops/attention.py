"""Multi-head attention for the V1T core.

Two interchangeable implementations of the hottest op in the model
(reference src/v1t/models/core/vit.py:253-275 — softmax(q k^T * scale) v over
~1654 tokens, per-head dim 155):

- ``_attention_xla``: straightforward jnp einsums. XLA fuses the scale/mask
  into the matmuls; softmax runs in fp32. Used on CPU, for small shapes, and
  as the parity oracle for the kernel. Also the only path that can export the
  post-softmax probabilities needed by attention rollout (reference
  src/v1t/utils/attention_rollout.py:15-77).
- ``_attention_pallas``: a blockwise flash-attention Pallas kernel (O(N)
  memory, bf16 matmul inputs, fp32 accumulation) in
  ``v1t_tpu.ops.flash_attention``. Removes the need for the reference's
  per-attention gradient checkpointing (vit.py:277-284) entirely.

Both support LSA (Locality Self Attention, reference vit.py:234-261):
a learnable per-head temperature and the diagonal masked to -inf before
softmax.
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp


def _attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: jax.Array,
    use_lsa: bool,
    dropout_rate: float,
    deterministic: bool,
    rng: t.Optional[jax.Array],
    return_probs: bool,
):
    """q, k, v: (B, H, N, D). scale: scalar () or per-head (H,)."""
    _, _, n, _ = q.shape
    scale = jnp.asarray(scale, jnp.float32)
    if scale.ndim == 1:  # per-head LSA temperature
        scale = scale[None, :, None, None]
    dots = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    )
    dots = dots * scale
    if use_lsa:
        # mask the diagonal to -max_float (reference vit.py:256-261)
        eye = jnp.eye(n, dtype=bool)
        dots = jnp.where(eye, -jnp.finfo(jnp.float32).max, dots)
    probs = jax.nn.softmax(dots, axis=-1)
    attn = probs
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(rng, p=1.0 - dropout_rate, shape=attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    if return_probs:
        return out, probs
    return out


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: jax.Array,
    *,
    use_lsa: bool = False,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    rng: t.Optional[jax.Array] = None,
    impl: str = "auto",
    return_probs: bool = False,
):
    """Dispatch to the Pallas flash kernel or the XLA einsum path.

    Args:
        q, k, v: (B, H, N, D).
        scale: softmax temperature — scalar, or (H,) when ``use_lsa``.
        impl: "auto" (pallas on TPU when eligible), "pallas", or "xla".
        return_probs: export post-softmax probabilities (XLA path only; used
            by the attention-rollout interpretability driver).
    Returns:
        (B, H, N, D) context, plus (B, H, N, N) probabilities if requested.
    """
    if return_probs:
        impl = "xla"
    if impl == "auto":
        from v1t_tpu.ops.common import interpret_enabled

        platform = jax.default_backend()
        on_tpu = platform in ("tpu", "axon") or interpret_enabled()
        # tiny sequences aren't worth a kernel launch
        impl = "pallas" if (on_tpu and q.shape[2] >= 256) else "xla"
    if impl == "pallas":
        from v1t_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q,
            k,
            v,
            scale,
            use_lsa=use_lsa,
            dropout_rate=dropout_rate,
            deterministic=deterministic,
            rng=rng,
        )
    return _attention_xla(
        q,
        k,
        v,
        scale,
        use_lsa=use_lsa,
        dropout_rate=dropout_rate,
        deterministic=deterministic,
        rng=rng,
        return_probs=return_probs,
    )
