"""Tracing / profiling utilities (SURVEY §5: absent in the reference beyond
wall-clock prints; here: structured step timing + jax profiler traces).
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """images/sec + step-time meter (device-synchronized)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.images = 0
        self.steps = 0
        self.elapsed = 0.0

    @contextlib.contextmanager
    def step(self, batch_size: int, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.elapsed += time.perf_counter() - t0
        self.images += batch_size
        self.steps += 1

    @property
    def images_per_sec(self):
        return self.images / self.elapsed if self.elapsed else 0.0

    @property
    def ms_per_step(self):
        return 1000.0 * self.elapsed / self.steps if self.steps else 0.0


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; view with tensorboard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
