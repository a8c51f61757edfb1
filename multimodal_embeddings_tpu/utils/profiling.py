"""Tracing and per-stage timing.

The reference's only measurement machinery is a stage-0 elapsed-time log
(``0_orientation.py:372-382``). Here every pipeline stage can be wrapped in
a ``StageTimer`` (wall time + throughput summary) and whole runs can be
captured with ``jax.profiler`` traces for tensorboard
(``trace("/tmp/trace")``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

from multimodal_embeddings_tpu.io.logging_setup import get_logger

logger = get_logger("profiling")


class StageTimer:
    """Accumulates named stage timings; prints a one-block summary."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._order: List[str] = []

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 1) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            if name not in self.totals:
                self.totals[name] = 0.0
                self.counts[name] = 0
                self._order.append(name)
            self.totals[name] += elapsed
            self.counts[name] += items

    def summary(self) -> str:
        lines = ["stage timing summary:"]
        grand = sum(self.totals.values())
        for name in self._order:
            total = self.totals[name]
            count = self.counts[name]
            rate = count / total if total > 0 else 0.0
            lines.append(
                f"  {name:<28s} {total:8.2f}s  {count:5d} items "
                f"({rate:7.2f}/s, {100 * total / grand if grand else 0:4.1f}%)"
            )
        lines.append(f"  {'TOTAL':<28s} {grand:8.2f}s")
        return "\n".join(lines)

    def log_summary(self) -> None:
        logger.info("%s", self.summary())


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace wrapper; no-op when ``log_dir`` is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in profiler traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
