"""Utilities: profiling/tracing hooks, numerics guards."""

from .profiling import (  # noqa: F401
    trace_annotation,
    profile_trace,
    ThroughputMeter,
    log_throughput,
)
from .guards import check_finite_tree, enable_nan_debugging  # noqa: F401
