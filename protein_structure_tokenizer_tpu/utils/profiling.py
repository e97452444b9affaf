"""Tracing / profiling hooks.

The reference has no profiler integration — only wall-clock logging around
batches (inference_runner.py:286,323-324).  Here every runner loop can emit an
XLA profiler trace (viewable in XProf/TensorBoard or Perfetto) and per-stage
wall-clock aggregates.
"""
from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """Wrap a region in ``jax.profiler.trace`` when ``trace_dir`` is set.

    No-op when ``trace_dir`` is None, so call sites can pass the flag through
    unconditionally.
    """
    if trace_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


class StageTimers:
    """Accumulate wall-clock per named pipeline stage; log a summary."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def annotated_stage(self, name: str):
        """Stage timer that also emits a named XLA trace annotation, so the
        host-side stage shows up aligned with device ops in the profile."""
        import jax

        outer = self.stage(name)

        @contextlib.contextmanager
        def both():
            with outer, jax.profiler.TraceAnnotation(name):
                yield

        return both()

    def summary(self) -> str:
        total = sum(self.totals.values()) or 1.0
        parts = [
            f"{name}: {self.totals[name]:.3f}s ({100 * self.totals[name] / total:.0f}%, n={self.counts[name]})"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return "; ".join(parts)

    def log_summary(self, prefix: str = "stages") -> None:
        if self.totals:
            logger.info("%s: %s", prefix, self.summary())
