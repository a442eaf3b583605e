"""Tracing / profiling hooks (SURVEY.md §5: the reference has none; the
TPU framework exposes jax.profiler annotations and an edges/s meter)."""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace_annotation(name: str) -> Iterator[None]:
    """Named region in the device trace (visible in xprof/tensorboard)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Running edges/s / graphs/s meter (the framework's north-star
    observability metric)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._edges = 0
        self._graphs = 0
        self._steps = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def update(self, num_edges: int, num_graphs: int) -> None:
        if self._t0 is None:
            self.start()
        self._edges += int(num_edges)
        self._graphs += int(num_graphs)
        self._steps += 1

    @property
    def elapsed(self) -> float:
        return 0.0 if self._t0 is None else time.perf_counter() - self._t0

    def summary(self) -> dict:
        dt = max(self.elapsed, 1e-9)
        return {
            "edges_per_s": self._edges / dt,
            "graphs_per_s": self._graphs / dt,
            "steps_per_s": self._steps / dt,
            "elapsed_s": dt,
        }


def log_throughput(meter: ThroughputMeter, prefix: str = "") -> None:
    s = meter.summary()
    logger.info("%sthroughput: %.3g edges/s, %.3g graphs/s (%.1fs)",
                prefix, s["edges_per_s"], s["graphs_per_s"], s["elapsed_s"])
