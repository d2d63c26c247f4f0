"""Tracing / profiling — first-class here, absent upstream (the reference
only had torchinfo param counts and log timestamps, SURVEY §5).

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace directory.
- :class:`StepTimer` — wall-clock per-step statistics with device sync,
  for steady-state step-time reporting.
"""

import contextlib
import time
from typing import List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile the enclosed block: ``with trace('/tmp/prof'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Collects per-step wall times (seconds). ``block=True`` syncs the
    device so times measure completed work, not dispatch."""

    def __init__(self, block: bool = True):
        self.block = block
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.block:
            (jax.device_put(0.0) + 0).block_until_ready()
        self.times.append(time.perf_counter() - self._t0)
        return False

    def wrap(self, fn):
        """Wrap a step function: returns a timed version."""

        def timed(*a, **k):
            with self:
                out = fn(*a, **k)
                if self.block:
                    jax.block_until_ready(out)
            return out

        return timed

    @property
    def mean(self):
        return sum(self.times) / max(len(self.times), 1)

    def summary(self, warmup: int = 1):
        ts = self.times[warmup:] or self.times
        ts_sorted = sorted(ts)
        return {
            "steps": len(ts),
            "mean_s": sum(ts) / len(ts),
            "p50_s": ts_sorted[len(ts) // 2],
            "max_s": ts_sorted[-1],
        }
