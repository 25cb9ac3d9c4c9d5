"""Ablation bench of the fused MLP sublayer kernel (v1t_tpu/ops/fused_mlp.py)
at the flagship shapes: B=96, N=1653 tokens, E=155, F=488, p_dropout=0.0229.

Each case monkeypatches one kernel ingredient (GELU, LayerNorm, dropout)
before tracing, so the measured deltas attribute the sublayer's VPU cost to
its pieces. Patched variants produce WRONG math — measurement only.

Methodology: enqueue-N/sync-once (bench.py's), chip must be EXCLUSIVE
(BENCH_NOTES.md round-3 measurement gotcha).

Usage: python misc/bench_mlp_ablate.py
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

B, N, E, F = 96, 1653, 155, 488
P_DROP = 0.0229


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


def build(mod, dropout_rate):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, E)).astype(np.float32), jnp.bfloat16)
    gamma = jnp.ones((E,), jnp.float32)
    beta = jnp.zeros((E,), jnp.float32)
    w1 = jnp.asarray(
        rng.normal(size=(E, F), scale=0.05).astype(np.float32), jnp.bfloat16
    )
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray(
        rng.normal(size=(F, E), scale=0.05).astype(np.float32), jnp.bfloat16
    )
    b2 = jnp.zeros((E,), jnp.float32)
    key = jax.random.key(0)

    def fwd(x, w1, w2):
        return mod.fused_mlp(
            x, gamma, beta, w1, b1, w2, b2,
            dropout_rate=dropout_rate, deterministic=False, rng=key,
        ).sum()

    def fwdbwd(x, w1, w2):
        l, grads = jax.value_and_grad(fwd, argnums=(1, 2))(x, w1, w2)
        return l, grads

    return (
        jax.jit(fwd), jax.jit(fwdbwd), (x, w1, w2)
    )


def main():
    import importlib
    import v1t_tpu.ops.fused_mlp as m

    def run(tag, dropout_rate=P_DROP, patch=None):
        importlib.reload(m)
        if patch:
            patch(m)
        fwd, fwdbwd, args = build(m, dropout_rate)
        t_f = _bench(fwd, args)
        t_fb = _bench(fwdbwd, args)
        print(f"{tag:38s} fwd {t_f:7.3f} ms   fwd+bwd {t_fb:7.3f} ms")
        return t_f, t_fb

    def no_gelu(mod):
        mod._gelu = lambda x: x
        mod._dgelu = lambda x: jnp.ones_like(x)

    def tanh_gelu(mod):
        def g(x):
            return 0.5 * x * (
                1.0 + jnp.tanh(0.7978845608 * (x + 0.044715 * x * x * x))
            )
        def dg(x):
            t = jnp.tanh(0.7978845608 * (x + 0.044715 * x * x * x))
            dt = (1.0 - t * t) * 0.7978845608 * (1.0 + 3 * 0.044715 * x * x)
            return 0.5 * (1.0 + t) + 0.5 * x * dt
        mod._gelu = g
        mod._dgelu = dg

    def no_ln(mod):
        mod._layernorm = lambda x32, g, b, eps=1e-5: (
            x32, x32, jnp.ones_like(x32[..., :1])
        )

    def cheap_erf(mod):
        # polynomial-only probe: drops the division and the exp
        def e(x):
            return jnp.clip(x * 0.5, -1.0, 1.0)
        mod._erf = e
        mod._gelu = lambda x: 0.5 * x * (1.0 + e(x * np.float32(0.7071)))
        mod._dgelu = lambda x: 0.5 * (1.0 + e(x * np.float32(0.7071)))

    def poly_erf(mod):
        # two-piece odd polynomial, max abs err 6.6e-7 (exact-class), no
        # division / exp — see round-5 BENCH_NOTES
        P1 = [1.12837911968883, -0.37612431794781714, 0.1128230169462877,
              -0.026824737744710895, 0.005165741247422383,
              -0.0008080499238700202, 9.773696269471999e-05,
              -7.99111981070813e-06, 3.204912194134735e-07]
        P2 = [0.9999444505687899, 0.00033522444742944664,
              -0.000960025435858777, 0.0016951192437241998,
              -0.002060813849832102, 0.0019255698951874728,
              -0.0013621004189125917, 0.0004946421192036274]

        def e(x):
            ax = jnp.abs(x)
            z = ax * ax
            a1 = jnp.float32(P1[-1])
            for co in P1[-2::-1]:
                a1 = a1 * z + jnp.float32(co)
            e1 = a1 * ax
            u = ax - jnp.float32(2.85)
            a2 = jnp.float32(P2[-1])
            for co in P2[-2::-1]:
                a2 = a2 * u + jnp.float32(co)
            out = jnp.where(ax < 2.0, e1, a2)
            out = jnp.where(ax > 3.7, jnp.float32(1.0), out)
            return jnp.sign(x) * out

        mod._erf = e

    run("baseline (p=0.0229)")
    run("erf -> 2-piece poly", patch=poly_erf)
    run("dropout off", dropout_rate=0.0)
    run("gelu -> identity", patch=no_gelu)
    run("gelu -> tanh approx", patch=tanh_gelu)
    run("erf -> clip poly probe", patch=cheap_erf)
    run("layernorm -> identity", patch=no_ln)


if __name__ == "__main__":
    main()
