"""Standalone bench of the Gaussian2d readout sampling kernels
(v1t_tpu/ops/interp_matmul.py) at the flagship shapes: B=64, C=155,
feature map 29x57 (T=1653), P=7000 neurons.

Methodology: enqueue-N/sync-once (bench.py's), chip must be EXCLUSIVE
(BENCH_NOTES.md round-3 measurement gotcha). Prints fwd and fwd+bwd
per-step times plus derived readout-only cost.

Usage: python misc/bench_readout.py
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

import jax.numpy as jnp
import numpy as np

B, C, H, W, P = 64, 155, 29, 57, 7000


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
    from v1t_tpu.ops.interp_matmul import interp_matmul_sample_cm

    rng = np.random.default_rng(0)
    flat = jnp.asarray(
        rng.normal(size=(B, C, H * W)).astype(np.float32), jnp.bfloat16
    )
    grid = jnp.asarray(
        rng.uniform(-0.95, 0.95, size=(B, P, 2)).astype(np.float32)
    )
    # the (C, P) feature weights keep XLA from algebraically folding the
    # sampling matmul into rank-1 row/col sums (sum(A@B) == rowsum.colsum)
    feats = jnp.asarray(
        rng.normal(size=(C, P)).astype(np.float32), jnp.bfloat16
    )

    @jax.jit
    def fwd(flat, grid):
        out = interp_matmul_sample_cm(flat, grid, height=H, width=W)
        return jnp.sum(out.astype(jnp.float32) * feats.astype(jnp.float32))

    @jax.jit
    def fwdbwd(flat, grid):
        return jax.grad(
            lambda f, g: jnp.sum(
                interp_matmul_sample_cm(f, g, height=H, width=W).astype(
                    jnp.float32
                )
                * feats.astype(jnp.float32)
            ),
            argnums=(0, 1),
        )(flat, grid)

    t_f = _bench(fwd, (flat, grid))
    t_fb = _bench(fwdbwd, (flat, grid))
    print(f"fwd:      {t_f:7.3f} ms")
    print(f"fwd+bwd:  {t_fb:7.3f} ms   (bwd ~= {t_fb - t_f:.3f} ms)")


if __name__ == "__main__":
    main()


def trace(outdir="/tmp/readout_prof"):
    """Capture a jax.profiler trace of fwdbwd for op-level attribution."""
    from v1t_tpu.ops.interp_matmul import interp_matmul_sample_cm

    rng = np.random.default_rng(0)
    flat = jnp.asarray(
        rng.normal(size=(B, C, H * W)).astype(np.float32), jnp.bfloat16
    )
    grid = jnp.asarray(
        rng.uniform(-0.95, 0.95, size=(B, P, 2)).astype(np.float32)
    )
    feats = jnp.asarray(
        rng.normal(size=(C, P)).astype(np.float32), jnp.bfloat16
    )

    @jax.jit
    def fwdbwd(flat, grid):
        return jax.grad(
            lambda f, g: jnp.sum(
                interp_matmul_sample_cm(f, g, height=H, width=W).astype(
                    jnp.float32
                )
                * feats.astype(jnp.float32)
            ),
            argnums=(0, 1),
        )(flat, grid)

    out = fwdbwd(flat, grid)
    jax.block_until_ready(out)
    with jax.profiler.trace(outdir):
        for _ in range(5):
            out = fwdbwd(flat, grid)
        jax.block_until_ready(out)
    print("trace written to", outdir)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "trace":
    trace()
