"""Tracing & profiling: spans around engine phases + on-demand device profiling.

The reference's only tracing is wall-clock middleware timing (reference:
src/mlvectordb/api/rest_api.py:352,370-376; SURVEY.md §5.1).  Here every engine phase
(kernel dispatch, hydration, mask compilation, scatter) runs under a span that (a) feeds
an in-process ring buffer served by GET /trace, and (b) emits a
``jax.profiler.TraceAnnotation`` so spans line up with device timelines in xprof when a
device trace is captured via start_device_trace/stop_device_trace (REST: /profile/*).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from contextlib import contextmanager
from typing import Any, Dict, List, Optional

import jax


class SpanRecorder:
    """Lock-protected ring buffer of completed spans + per-name aggregates."""

    def __init__(self, max_spans: int = 2048):
        self._lock = threading.Lock()
        self._spans: deque = deque(maxlen=max_spans)
        self._agg: Dict[str, Dict[str, float]] = {}

    def record(self, name: str, start: float, elapsed_s: float, attrs: Dict[str, Any]):
        with self._lock:
            self._spans.append(
                {"name": name, "start": start, "elapsed_ms": elapsed_s * 1e3, **attrs}
            )
            agg = self._agg.setdefault(
                name, {"count": 0, "total_ms": 0.0, "max_ms": 0.0}
            )
            agg["count"] += 1
            agg["total_ms"] += elapsed_s * 1e3
            agg["max_ms"] = max(agg["max_ms"], elapsed_s * 1e3)

    def recent(self, limit: int = 100) -> List[Dict[str, Any]]:
        with self._lock:
            return list(self._spans)[-limit:]

    def summary(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            return {
                name: {**a, "avg_ms": a["total_ms"] / a["count"] if a["count"] else 0.0}
                for name, a in self._agg.items()
            }

    def clear(self) -> None:
        with self._lock:
            self._spans.clear()
            self._agg.clear()


RECORDER = SpanRecorder()


@contextmanager
def trace_span(name: str, **attrs):
    """Wall-clock span + xprof TraceAnnotation (shows up on device timelines)."""
    start = time.time()
    t0 = time.perf_counter()
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        RECORDER.record(name, start, time.perf_counter() - t0, attrs)


class DeviceProfiler:
    """On-demand jax.profiler device trace capture (xprof-compatible artifacts)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._dir: Optional[str] = None

    @property
    def active(self) -> bool:
        return self._dir is not None

    def start(self, log_dir: str) -> None:
        with self._lock:
            if self._dir is not None:
                raise RuntimeError(f"profiler already tracing to {self._dir}")
            jax.profiler.start_trace(log_dir)
            self._dir = log_dir

    def stop(self) -> str:
        with self._lock:
            if self._dir is None:
                raise RuntimeError("profiler is not tracing")
            jax.profiler.stop_trace()
            d, self._dir = self._dir, None
            return d


PROFILER = DeviceProfiler()
