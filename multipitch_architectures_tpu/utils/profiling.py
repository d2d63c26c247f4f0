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
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile the enclosed block: ``with trace('/tmp/prof'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(value=None):
    """Force completion of outstanding device work by FETCHING a scalar.

    NB on relayed/tunneled backends (the axon TPU path in this image)
    ``block_until_ready`` can return at enqueue time — a host fetch is the
    only truthful synchronization. Pass a value derived from your
    computation when possible."""
    if value is None:
        value = jnp.zeros(())
    arr = jnp.asarray(value)
    while arr.ndim:
        arr = arr.reshape(-1)[0]
    return float(arr)


class StepTimer:
    """Collects per-step wall times (seconds). ``block=True`` syncs the
    device (via a host scalar fetch — see :func:`device_sync`) so times
    measure completed work, not dispatch."""

    def __init__(self, block: bool = True):
        self.block = block
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.block:
            device_sync()
        self.times.append(time.perf_counter() - self._t0)
        return False

    def wrap(self, fn):
        """Wrap a step function: returns a timed version."""

        def timed(*a, **k):
            with self:
                out = fn(*a, **k)
                if self.block:
                    leaves = jax.tree.leaves(out)
                    if leaves:
                        device_sync(jnp.sum(leaves[0]))
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
