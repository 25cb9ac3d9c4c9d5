"""Microbenchmark: MXU cost of lane-padded vs sublane-padded contractions.

V1T's head dim D=155 pads to 256 lanes (1.65x) in the attention matmuls but
only to 160 sublanes (1.03x). If Mosaic executes dt-form dot_generals
(contraction over dim 0 of both operands) at full MXU rate, a transposed
(D, N)-layout attention kernel saves ~45% of the padded MACs
(BENCH_NOTES.md round-3). This bench measures isolated Pallas kernels for
each matmul shape in both orientations on the real chip.

Timing: the axon relay adds ~26 ms of round-trip latency per synced call
and block_until_ready does not reliably sync on this platform, so naive
per-call timing measures the tunnel, not the MXU. Each case is therefore
compiled at two inner-loop repetition counts (a fori_loop of serially
dependent matmuls) and timed with a forced host pull; the SLOPE
(t_hi - t_lo) / (reps_hi - reps_lo) cancels every constant overhead and
isolates per-matmul device time.
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1664
D = 155  # head dim / emb dim
REPS_LO = 256
REPS_HI = 1024


def _time_synced(fn, *args, n_iter=4):
    v = float(fn(*args))  # compile + real sync (host pull)
    assert np.isfinite(v)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            v = float(fn(*args))
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def make_kernel(dims, out_shape, reps):
    """A kernel computing `reps` serially dependent dot_generals."""

    def kernel(a_ref, b_ref, o_ref):
        def body(_, carry):
            a, acc = carry
            s = jax.lax.dot_general(
                a, b_ref[...], (dims, ((), ())),
                preferred_element_type=jnp.float32,
            )
            # serial dependency on s, wrapped in an elementwise nonlinearity:
            # a plain scalar add distributes through the next dot
            # (dot(a+c,b) == dot(a,b) + c*colsum(b)) and the accumulated sum
            # of dots against a fixed b folds into one dot of summed a's —
            # abs() blocks both rewrites.
            a = jnp.abs(a + (s[0, 0] * jnp.float32(1e-30)).astype(a.dtype))
            return a, acc + s

        _, acc = jax.lax.fori_loop(
            0, reps,
            body,
            (a_ref[...], jnp.zeros(out_shape, jnp.float32)),
        )
        o_ref[...] = acc

    return kernel


def bench_case(name, a_shape, b_shape, dims, out_shape, algo_macs):
    a = jnp.asarray(
        np.random.default_rng(0).normal(size=a_shape), jnp.bfloat16
    )
    b = jnp.asarray(
        np.random.default_rng(1).normal(size=b_shape), jnp.bfloat16
    )
    times = {}
    for reps in (REPS_LO, REPS_HI):
        fn = pl.pallas_call(
            make_kernel(dims, out_shape, reps),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )
        f = jax.jit(lambda a, b, fn=fn: jnp.sum(fn(a, b)))
        times[reps] = _time_synced(f, a, b)
    per_mm = (times[REPS_HI] - times[REPS_LO]) / (REPS_HI - REPS_LO)
    eff_tflops = 2 * algo_macs / per_mm / 1e12
    print(
        f"{name:44s} {per_mm*1e6:9.2f} us/matmul   "
        f"algo {2*algo_macs/1e9:6.2f} GFLOP -> {eff_tflops:6.1f} TF/s"
    )
    return per_mm


def main():
    print(f"device: {jax.devices()[0]}")
    macs_qk = N * D * N  # algorithmic
    # scores: q @ k^T, contraction over D
    bench_case(
        "scores lane-K:   (N,D)x(N,D) dims ((1),(1))",
        (N, D), (N, D), ((1,), (1,)), (N, N), macs_qk,
    )
    bench_case(
        "scores sublane-K:(D,N)x(D,N) dims ((0),(0))",
        (D, N), (D, N), ((0,), (0,)), (N, N), macs_qk,
    )
    # pv: p @ v, contraction over N(keys)
    macs_pv = N * N * D
    bench_case(
        "pv lane-out:     (N,N)x(N,D) dims ((1),(0))",
        (N, N), (N, D), ((1,), (0,)), (N, D), macs_pv,
    )
    bench_case(
        "pv sublane-out:  (D,N)x(N,N) dims ((1),(0))",
        (D, N), (N, N), ((1,), (0,)), (D, N), macs_pv,
    )
    # qkv projection: ln @ w, contraction over E
    macs_q = N * D * D
    bench_case(
        "proj lane:       (N,E)x(E,D) dims ((1),(0))",
        (N, D), (D, D), ((1,), (0,)), (N, D), macs_q,
    )
    bench_case(
        "proj sublane:    (E,D)x(E,N) dims ((0),(0))",
        (D, D), (D, N), ((0,), (0,)), (D, N), macs_q,
    )
    # output projection accumulate: wp^T-form
    bench_case(
        "outproj lane:    (N,D)x(D,E) dims ((1),(0))",
        (N, D), (D, D), ((1,), (0,)), (N, D), macs_q,
    )
    bench_case(
        "outproj sublane: (D,E)x(D,N) dims ((0),(0))",
        (D, D), (D, N), ((0,), (0,)), (D, N), macs_q,
    )
    # dk/dv in the transposed backward: (D,Ni)x(Nj,Ni) dims ((1),(1)) —
    # lane-lane contraction with an ALIGNED K (1664)
    bench_case(
        "dkT lane-laneK:  (D,N)x(N,N) dims ((1),(1))",
        (D, N), (N, N), ((1,), (1,)), (D, N), macs_pv,
    )
    # MLP fc1: (N,E)x(E,H) vs (E,H)x(E,N)
    H = 488
    macs_fc1 = N * D * H
    bench_case(
        "fc1 lane:        (N,E)x(E,H) dims ((1),(0))",
        (N, D), (D, H), ((1,), (0,)), (N, H), macs_fc1,
    )
    bench_case(
        "fc1 sublane:     (E,H)x(E,N) dims ((0),(0))",
        (D, H), (D, N), ((0,), (0,)), (H, N), macs_fc1,
    )
    # fc2: (N,H)x(H,E) vs (H,E)x(H,N)
    bench_case(
        "fc2 lane:        (N,H)x(H,E) dims ((1),(0))",
        (N, H), (H, D), ((1,), (0,)), (N, D), macs_fc1,
    )
    bench_case(
        "fc2 sublane:     (H,E)x(H,N) dims ((0),(0))",
        (H, D), (H, N), ((0,), (0,)), (D, N), macs_fc1,
    )


if __name__ == "__main__":
    main()
