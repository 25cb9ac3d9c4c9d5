"""Standalone bench of the fused attention sublayer kernel
(v1t_tpu/ops/fused_mha.py) at the flagship shapes: B=64, N=1654, E=155,
H=4, D=155 — one transformer block's attention. Enqueue-N/sync-once,
EXCLUSIVE chip required (BENCH_NOTES.md).

Knobs (env): V1T_DT_FORM, V1T_ATTN_DROPOUT=0 disables dropout,
V1T_ATTN_LSA=1 enables LSA.

Usage: python misc/bench_attn.py
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
)
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np

B, N, E, HEADS, D = 64, 1654, 155, 4, 155
DROPOUT = 0.0 if os.environ.get("V1T_ATTN_DROPOUT", "") == "0" else 0.2544
USE_LSA = os.environ.get("V1T_ATTN_LSA", "") == "1"


def _bench(fn, args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def main():
    from v1t_tpu.ops.fused_mha import fused_mha

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, E)) * 0.3, jnp.bfloat16)
    gamma = jnp.ones((E,), jnp.float32)
    beta = jnp.zeros((E,), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(3, HEADS, E, D)) * 0.05, jnp.bfloat16)
    wp = jnp.asarray(rng.normal(size=(HEADS, D, E)) * 0.05, jnp.bfloat16)
    bp = jnp.zeros((E,), jnp.bfloat16)
    scale = jnp.full((HEADS,), E ** -0.5, jnp.float32)
    brow = jnp.asarray(rng.normal(size=(B, E)) * 0.1, jnp.bfloat16)
    key = jax.random.key(7)
    # weights that keep XLA from folding sum(out) algebraically
    wsum = jnp.asarray(rng.normal(size=(N, E)), jnp.bfloat16)

    def call(x, wqkv, wp):
        return fused_mha(
            x, gamma, beta, wqkv, wp, bp, scale,
            use_lsa=USE_LSA, dropout_rate=DROPOUT, deterministic=False,
            rng=key, fold_out_dropout=True, fold_residual=True,
            bias_row=brow,
        )

    @jax.jit
    def fwd(x, wqkv, wp):
        out = call(x, wqkv, wp)
        return jnp.sum(out.astype(jnp.float32) * wsum.astype(jnp.float32))

    @jax.jit
    def fwdbwd(x, wqkv, wp):
        return jax.grad(
            lambda *a: jnp.sum(
                call(*a).astype(jnp.float32) * wsum.astype(jnp.float32)
            ),
            argnums=(0, 1, 2),
        )(x, wqkv, wp)

    t_f = _bench(fwd, (x, wqkv, wp))
    t_fb = _bench(fwdbwd, (x, wqkv, wp))
    bh = B * HEADS
    print(
        f"fwd:      {t_f:7.3f} ms  ({t_f * 1e3 / bh:6.2f} us/(b,h))"
    )
    print(
        f"fwd+bwd:  {t_fb:7.3f} ms  (bwd ~= {t_fb - t_f:.3f} ms, "
        f"{(t_fb - t_f) * 1e3 / bh:6.2f} us/(b,h))"
    )


if __name__ == "__main__":
    main()
