"""Auxiliary subsystems: tracing/profiling spans, health/failure detection."""

from .tracing import PROFILER, RECORDER, trace_span
from .health import deep_health, probe_device

__all__ = ["PROFILER", "RECORDER", "trace_span", "deep_health", "probe_device"]
