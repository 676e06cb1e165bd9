"""Failure detection: real health checks instead of a constant.

The reference's GET /health returns a hardcoded {"status": "healthy"} (reference:
src/mlvectordb/api/rest_api.py:292-296; SURVEY.md §5.3 — "no failure detection").  Here a
deep health check actually exercises the stack: device enumeration, a tiny device
computation round-trip (catches wedged runtimes/links), per-namespace invariant checks
(host tables vs live counts), and native-layer availability.  Recovery path: reload from
the latest snapshot (engine.persist) — surfaced here as actionable status.
"""

from __future__ import annotations

import time
from typing import Any, Dict

import numpy as np


def probe_device(timeout_hint_s: float = 30.0) -> Dict[str, Any]:
    """Run a tiny computation on the default device and verify the result."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    try:
        devices = jax.devices()
        x = jnp.arange(8.0)
        got = float(np.asarray(jnp.sum(x * 2.0)))
        ok = abs(got - 56.0) < 1e-6
        return {
            "ok": ok,
            "platform": jax.default_backend(),
            "device_count": len(devices),
            "devices": [str(d) for d in devices[:8]],
            "probe_ms": (time.perf_counter() - t0) * 1e3,
        }
    except Exception as e:  # pragma: no cover - device failure path
        return {
            "ok": False,
            "error": f"{type(e).__name__}: {e}",
            "probe_ms": (time.perf_counter() - t0) * 1e3,
        }


def check_store_invariants(storage) -> Dict[str, Any]:
    """Host-side consistency: id maps vs slot tables vs live counts."""
    issues = []
    for name in storage.list_namespaces():
        ns = storage.namespace(name)
        if ns is None:
            continue
        live = ns.live_count
        mapped = sum(1 for s in ns._slot_ids if s is not None)
        if live != mapped:
            issues.append(
                f"namespace {name!r}: id_to_slot has {live} ids but {mapped} slots are mapped"
            )
        for vid, slot in list(ns._id_to_slot.items())[:1000]:  # bounded sample
            if ns._slot_ids[slot] != vid:
                issues.append(f"namespace {name!r}: slot {slot} maps to wrong id")
                break
    return {"ok": not issues, "issues": issues}


def deep_health(query_processor) -> Dict[str, Any]:
    from .. import __version__

    device = probe_device()
    store = check_store_invariants(query_processor.storage)
    try:
        from ..native import available as native_available

        native_ok = native_available()
    except Exception:  # pragma: no cover
        native_ok = False

    healthy = device["ok"] and store["ok"]
    return {
        "status": "healthy" if healthy else "degraded",
        "version": __version__,
        "device": device,
        "store": store,
        "native_filter_engine": native_ok,
        "total_vectors": query_processor.storage.total_vectors,
        "namespaces": len(query_processor.storage.list_namespaces()),
    }
