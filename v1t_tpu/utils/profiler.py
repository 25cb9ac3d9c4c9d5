"""Profiling hooks (SURVEY §5.1): the reference only logs per-epoch
wall-clock; the TPU framework adds a jax.profiler trace capture around a
window of training steps, viewable in TensorBoard/Perfetto."""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(output_dir: str, enabled: bool = True):
    """Capture a profiler trace into <output_dir>/profile."""
    if not enabled:
        yield
        return
    import jax

    log_dir = os.path.join(output_dir, "profile")
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-clock with device fencing (block_until_ready), the
    benchmark-grade timing the reference lacks."""

    def __init__(self):
        import time

        self._time = time.perf_counter
        self.reset()

    def reset(self):
        self.times = []
        self._start = None

    def start(self):
        self._start = self._time()

    def stop(self, result=None):
        if result is not None:
            import jax

            jax.block_until_ready(result)
        self.times.append(self._time() - self._start)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
