"""Profiling / tracing hooks (the reference has none — SURVEY.md §5).

- ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of the wrapped steps.
- ``StepTimer``: host-side wall-clock accumulator with device sync, for
  steady-state throughput numbers (used by bench.py).
- ``assert_finite``: NaN/Inf guard equivalent to the reference's
  ``math.isfinite`` loss abort (``models/util.py:92-94``) but as a traced
  check usable inside jit via ``jax.debug``.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            # host readback, not block_until_ready: with several dispatches
            # in flight, block_until_ready can return before queued work
            # finishes on remote-device runtimes (measured on this dev
            # harness); a device_get cannot. Pass a SMALL value (a scalar
            # loss) so the transfer itself is negligible.
            jax.device_get(sync_value)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def best(self) -> float:
        return min(self.times)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times)


def assert_finite(x: jax.Array, name: str = "loss") -> jax.Array:
    """Traced NaN/Inf guard: raises at runtime (jax error) if non-finite."""
    from jax.experimental import checkify  # noqa: F401 — documented alternative

    def _check(v):
        jax.debug.callback(
            lambda val: (_ for _ in ()).throw(
                FloatingPointError(f"non-finite {name}: {val}")
            )
            if not bool(jnp.isfinite(val).all())
            else None,
            v,
        )
        return v

    return _check(x)
