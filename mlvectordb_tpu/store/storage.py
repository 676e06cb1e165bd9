"""Namespaced storage engine over device-resident NamespaceStores.

Capability parity with the reference's in-memory engine
(reference: src/mlvectordb/implementations/storage_engine_in_memory.py:11-86): the full
StorageEngine protocol surface — write/write_vectors/read/read_vectors/delete/exists/
clear_all/get_storage_info/namespace_map/delete_namespace/list_namespaces — with the same
observable semantics (delete garbage-collects an emptied namespace :49-50; exists scans all
namespaces :54-55; read of a missing id returns None :36-40), plus the README-advertised
query_by_metadata / iterate_vectors the reference never implemented (SURVEY.md §0.1).
"""

from __future__ import annotations

import threading
import uuid as uuid_mod
from typing import Any, Dict, Iterable, Iterator, List, Optional, Sequence

from ..config import DEFAULT_CONFIG, EngineConfig
from ..filters import matches_filter
from .namespace import NamespaceStore
from .vector import Vector


class StorageEngine:
    """Dict of NamespaceStores; all vector payloads live in device HBM.

    ``namespace_factory`` lets the distributed layer substitute ShardedNamespaceStore
    (parallel/store.py) without the engine knowing the difference.
    """

    def __init__(
        self,
        config: EngineConfig = DEFAULT_CONFIG,
        host_mirror: bool = True,
        namespace_factory=None,
    ):
        self.config = config
        self.host_mirror = host_mirror
        self._factory = namespace_factory or (
            lambda name: NamespaceStore(name, self.config, self.host_mirror)
        )
        self._namespaces: Dict[str, NamespaceStore] = {}
        self._lock = threading.RLock()

    # ------------------------------------------------------------------ namespaces

    def namespace(self, name: str, create: bool = False) -> Optional[NamespaceStore]:
        ns = self._namespaces.get(name)
        if ns is None and create:
            with self._lock:
                ns = self._namespaces.get(name)
                if ns is None:
                    ns = self._factory(name)
                    self._namespaces[name] = ns
        return ns

    def list_namespaces(self) -> List[str]:
        return list(self._namespaces.keys())

    def delete_namespace(self, namespace: str) -> bool:
        with self._lock:
            return self._namespaces.pop(namespace, None) is not None

    @property
    def namespace_map(self) -> Dict[str, List[Vector]]:
        return {name: ns.all_vectors() for name, ns in self._namespaces.items()}

    # ------------------------------------------------------------------ writes

    def write(self, vector: Vector, namespace: str = "default") -> None:
        self.namespace(namespace, create=True).upsert([vector])

    def write_vectors(self, vectors: Sequence[Vector], namespace: str = "default") -> None:
        if vectors:
            self.namespace(namespace, create=True).upsert(list(vectors))

    def delete(self, vector_id: uuid_mod.UUID, namespace: str = "default") -> bool:
        ns = self._namespaces.get(namespace)
        if ns is None:
            return False
        removed = ns.delete([vector_id])
        # empty-namespace GC, matching reference delete semantics
        # (storage_engine_in_memory.py:49-50)
        if removed and ns.live_count == 0:
            with self._lock:
                if ns.live_count == 0:
                    self._namespaces.pop(namespace, None)
        return bool(removed)

    def delete_vectors(
        self, vector_ids: Iterable[uuid_mod.UUID], namespace: str = "default"
    ) -> List[uuid_mod.UUID]:
        ns = self._namespaces.get(namespace)
        if ns is None:
            return []
        removed = ns.delete(list(vector_ids))
        if removed and ns.live_count == 0:
            with self._lock:
                if ns.live_count == 0:
                    self._namespaces.pop(namespace, None)
        return removed

    def clear_all(self) -> None:
        with self._lock:
            self._namespaces.clear()

    # ------------------------------------------------------------------ reads

    def read(self, vector_id: uuid_mod.UUID, namespace: str = "default") -> Optional[Vector]:
        ns = self._namespaces.get(namespace)
        return ns.get(vector_id) if ns else None

    def read_vectors(
        self, vector_ids: Iterable[uuid_mod.UUID], namespace: str = "default"
    ) -> List[Optional[Vector]]:
        ns = self._namespaces.get(namespace)
        if ns is None:
            return [None for _ in vector_ids]
        return [ns.get(vid) for vid in vector_ids]

    def exists(self, vector_id: uuid_mod.UUID) -> bool:
        return any(ns.contains(vector_id) for ns in self._namespaces.values())

    def query_by_metadata(
        self, filter: Dict[str, Any], namespace: str = "default"
    ) -> List[Vector]:
        ns = self._namespaces.get(namespace)
        if ns is None:
            return []
        mc = getattr(ns, "meta_columns", None)
        if mc is not None:
            try:
                mask = mc.eval(filter, ns.capacity)
            except (TypeError, ValueError):
                mask = None
            if mask is not None:
                from ..filters import _validate_spec_ops

                _validate_spec_ops(filter)
                return [
                    ns._vector_at(slot, vid)
                    for slot, vid, _meta in ns.iter_slots()
                    if mask[slot]
                ]
        return [
            ns._vector_at(slot, vid)
            for slot, vid, meta in ns.iter_slots()
            if matches_filter(meta or {}, filter)
        ]

    def iterate_vectors(self, namespace: str = "default") -> Iterator[Vector]:
        ns = self._namespaces.get(namespace)
        if ns is None:
            return iter(())
        return iter(ns.all_vectors())

    # ------------------------------------------------------------------ stats

    @property
    def total_vectors(self) -> int:
        return sum(ns.live_count for ns in self._namespaces.values())

    @property
    def storage_size(self) -> int:
        return sum(ns.nbytes for ns in self._namespaces.values())

    def get_storage_info(self) -> Dict[str, Any]:
        # same shape as the reference (storage_engine_in_memory.py:61-69), extended with
        # device-memory telemetry where the runtime exposes it
        per_ns = {name: ns.live_count for name, ns in self._namespaces.items()}
        info = {
            "storage_type": "tpu_hbm",
            "total_vectors": self.total_vectors,
            "storage_size_bytes": self.storage_size,
            "namespaces": list(self._namespaces.keys()),
            "vectors_per_namespace": per_ns,
            "namespace_count": len(self._namespaces),
            "offloaded_namespaces": [
                name for name, ns in self._namespaces.items()
                if getattr(ns, "offloaded", False)
            ],
        }
        try:
            import jax

            stats = jax.local_devices()[0].memory_stats()
            if stats:
                info["device_memory"] = {
                    "bytes_in_use": stats.get("bytes_in_use"),
                    "bytes_limit": stats.get("bytes_limit"),
                    "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                }
        except Exception:  # pragma: no cover - backend without memory_stats
            pass
        return info
