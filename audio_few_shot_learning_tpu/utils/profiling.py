"""Profiling: jax.profiler trace hooks + the episodes/sec north-star counter.

The reference has no profiling at all (SURVEY.md §5). Here:
  * ``profile_trace`` wraps a block in a jax.profiler trace (TensorBoard
    format) when the backend supports it, degrading to a no-op otherwise;
  * ``EpisodeThroughput`` tracks episodes/sec with exponential smoothing —
    the framework's north-star metric (BASELINE.json).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """Capture a device trace into ``log_dir`` (viewable with TensorBoard /
    xprof). No-op if profiling is unavailable on the backend."""
    if not enabled:
        yield
        return
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class EpisodeThroughput:
    """Smoothed episodes/sec counter."""

    def __init__(self, alpha: float = 0.3):
        self.alpha = alpha
        self.value: Optional[float] = None
        self.total_episodes = 0
        self._t0 = time.perf_counter()

    def update(self, episodes: int, seconds: float) -> float:
        eps = episodes / max(seconds, 1e-9)
        self.total_episodes += episodes
        self.value = eps if self.value is None else (
            self.alpha * eps + (1 - self.alpha) * self.value
        )
        return self.value

    @property
    def lifetime(self) -> float:
        return self.total_episodes / max(time.perf_counter() - self._t0, 1e-9)
