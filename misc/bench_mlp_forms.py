"""Slope-method microbench for dt-form MLP candidates (see
bench_dtform_matmul.py for the methodology): the remaining matmul forms and
the in-kernel transposes a transposed-stream fused MLP would need at V1T
shapes (N=1664 tokens, E=155, F=488 hidden).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, E, F = 1664, 155, 488
R_LO, R_HI = 256, 1024


def _timed(make_fn, args):
    ts = {}
    for reps in (R_LO, R_HI):
        f = make_fn(reps)
        v = float(f(*args))
        assert np.isfinite(v), v
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(4):
                v = float(f(*args))
            best = min(best, (time.perf_counter() - t0) / 4)
        ts[reps] = best
    return (ts[R_HI] - ts[R_LO]) / (R_HI - R_LO)


def mm_case(name, a_shape, b_shape, dims, out_shape, macs):
    def make(reps):
        def kernel(a_ref, b_ref, o_ref):
            def body(_, carry):
                a, acc = carry
                s = jax.lax.dot_general(
                    a, b_ref[...], (dims, ((), ())),
                    preferred_element_type=jnp.float32,
                )
                a = jnp.abs(
                    a + (s[(0,) * s.ndim] * jnp.float32(1e-30)).astype(a.dtype)
                )
                return a, acc + s

            _, acc = jax.lax.fori_loop(
                0, reps, body,
                (a_ref[...], jnp.zeros(out_shape, jnp.float32)),
            )
            o_ref[...] = acc

        f = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )
        return jax.jit(lambda a, b: jnp.sum(f(a, b)))

    a = jnp.asarray(np.random.default_rng(0).normal(size=a_shape), jnp.bfloat16)
    b = jnp.asarray(np.random.default_rng(1).normal(size=b_shape), jnp.bfloat16)
    per = _timed(make, (a, b))
    print(f"{name:52s} {per*1e6:8.2f} us  -> {2*macs/per/1e12:6.1f} TF/s")


def transpose_case(name, shape, dtype):
    def make(reps):
        def kernel(a_ref, o_ref):
            def body(_, carry):
                a, acc = carry
                t = jnp.swapaxes(a, 0, 1)
                acc = acc + t.astype(jnp.float32)
                bump = (acc[0, 0] * jnp.float32(1e-30)).astype(a.dtype)
                return jnp.abs(a + bump), acc

            _, acc = jax.lax.fori_loop(
                0, reps, body,
                (
                    a_ref[...],
                    jnp.zeros((shape[1], shape[0]), jnp.float32),
                ),
            )
            o_ref[...] = acc

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((shape[1], shape[0]), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )
        return jax.jit(lambda a: jnp.sum(f(a)))

    a = jnp.asarray(np.random.default_rng(0).normal(size=shape), dtype)
    per = _timed(make, (a,))
    print(f"{name:52s} {per*1e6:8.2f} us")


def main():
    print(f"device: {jax.devices()[0]}")
    macs1 = N * E * F
    # current (lane) forms
    mm_case("fc1 lane:   (N,E)x(E,F) ((1),(0)) -> (N,F)",
            (N, E), (E, F), ((1,), (0,)), (N, F), macs1)
    mm_case("fc2 lane:   (N,F)x(F,E) ((1),(0)) -> (N,E)",
            (N, F), (F, E), ((1,), (0,)), (N, E), macs1)
    mm_case("bwd dw2:    (N,F)x(N,E) ((0),(0)) -> (F,E)",
            (N, F), (N, E), ((0,), (0,)), (F, E), macs1)
    mm_case("bwd da:     (N,E)x(F,E) ((1),(1)) -> (N,F)",
            (N, E), (F, E), ((1,), (1,)), (N, F), macs1)
    mm_case("bwd dw1:    (N,E)x(N,F) ((0),(0)) -> (E,F)",
            (N, E), (N, F), ((0,), (0,)), (E, F), macs1)
    mm_case("bwd dln:    (N,F)x(E,F) ((1),(1)) -> (N,E)",
            (N, F), (E, F), ((1,), (1,)), (N, E), macs1)
    # dt-form candidates
    mm_case("fc1T:       (E,F)x(E,N) ((0),(0)) -> (F,N)",
            (E, F), (E, N), ((0,), (0,)), (F, N), macs1)
    mm_case("fc2 from hT:(F,N)x(F,E) ((0),(0)) -> (N,E)",
            (F, N), (F, E), ((0,), (0,)), (N, E), macs1)
    mm_case("dw2T:       (F,N)x(N,E) ((1),(0)) -> (F,E)",
            (F, N), (N, E), ((1,), (0,)), (F, E), macs1)
    mm_case("daT:        (F,E)x(N,E) ((1),(1)) -> (F,N)",
            (F, E), (N, E), ((1,), (1,)), (F, N), macs1)
    mm_case("dw1T:       (F,N)x(N,E) ((1),(0)) [same as dw2T]",
            (F, N), (N, E), ((1,), (0,)), (F, E), macs1)
    mm_case("dlnT:       (E,F)x(F,N) ((1),(0)) -> (E,N)",
            (E, F), (F, N), ((1,), (0,)), (E, N), macs1)
    # transposes the dt stream needs
    transpose_case("T (N,E) bf16 -> (E,N)", (N, 160), jnp.bfloat16)
    transpose_case("T (E,N) f32  -> (N,E)", (160, N), jnp.float32)
    transpose_case("T (N,F) bf16 -> (F,N)", (N, F), jnp.bfloat16)


if __name__ == "__main__":
    main()
