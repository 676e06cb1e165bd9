"""Snapshot persistence: save/load the whole store to disk.

The reference has no persistence at all — its README's save_index/load_index/
create_backup/restore_from_backup boxes are unimplemented (SURVEY.md §0.1, §5.4).  Here a
snapshot is the per-namespace device->host transfer of live rows + id table + metadata,
written as one .npz (values) + one .json (ids, metadata) per namespace, with a manifest.
"""

from __future__ import annotations

import json
import os
from typing import List

import numpy as np

from ..config import DEFAULT_CONFIG, EngineConfig

from ..store.storage import StorageEngine

_MANIFEST = "manifest.json"


def _ns_file(i: int) -> str:
    return f"namespace_{i:05d}"


def resolve_snapshot_dir(path) -> str | None:
    """``path`` or ``path + ".old"`` if either holds a complete snapshot, else None.

    Checkpoint swaps are rename(ckpt, old); rename(tmp, ckpt): a crash between the
    two renames leaves only the ``.old`` directory, and recovery must fall back to it
    rather than silently losing everything its pruned WAL segments covered
    (ADVICE r3 medium)."""
    if not path:
        return None
    if os.path.isfile(os.path.join(path, _MANIFEST)):
        return path
    old = path + ".old"
    if os.path.isfile(os.path.join(old, _MANIFEST)):
        return old
    return None


def save_storage(storage: StorageEngine, path: str) -> List[str]:
    import dataclasses

    os.makedirs(path, exist_ok=True)
    names = storage.list_namespaces()
    manifest = {
        "format": "mlvectordb-tpu-snapshot",
        "version": 1,
        # engine config captured for restore-time validation (dtype changes are legal —
        # values are stored f32 — but worth surfacing)
        "engine_config": dataclasses.asdict(storage.config),
        "namespaces": [],
    }
    for i, name in enumerate(names):
        ns = storage.namespace(name)
        if ns is None:
            continue
        snap = ns.snapshot_arrays()
        base = _ns_file(i)
        # uncompressed: float32 embeddings are near-incompressible and zlib makes
        # million-row snapshots minutes-slow for ~0% size win
        np.savez(os.path.join(path, base + ".npz"), values=snap["values"])
        with open(os.path.join(path, base + ".json"), "w") as f:
            json.dump(
                {"name": snap["name"], "dim": snap["dim"], "ids": snap["ids"],
                 "metadata": snap["metadata"]},
                f,
            )
        entry = {"name": name, "file": base, "count": len(snap["ids"])}
        # a trained IVF index is minutes of k-means at scale: persist its centroids +
        # layout so load() restores identical approximate search without retraining
        ivf = getattr(ns, "ivf", None)
        if ivf is not None:
            isnap = ivf.snapshot_arrays()
            np.savez(os.path.join(path, base + ".ivf.npz"), centroids=isnap.pop("centroids"))
            with open(os.path.join(path, base + ".ivf.json"), "w") as f:
                json.dump(isnap, f)
            entry["ivf"] = True
        manifest["namespaces"].append(entry)
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return names


def load_storage(
    path: str,
    config: EngineConfig = DEFAULT_CONFIG,
    storage: StorageEngine = None,
) -> StorageEngine:
    """Restore a snapshot directory.  Pass ``storage`` (a fresh engine whose
    namespace_factory builds e.g. ShardedNamespaceStore) to restore INTO a
    distributed engine — namespaces are created through its factory so mesh
    placement is re-applied; default is a plain single-device engine."""
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("format") != "mlvectordb-tpu-snapshot":
        raise ValueError(f"not a snapshot directory: {path}")
    saved_cfg = manifest.get("engine_config") or {}
    if saved_cfg.get("dtype") and saved_cfg["dtype"] != config.dtype:
        import logging

        logging.getLogger(__name__).warning(
            "snapshot was written with dtype=%s, loading into dtype=%s "
            "(values are stored f32; this only changes device storage precision)",
            saved_cfg["dtype"], config.dtype,
        )
    if storage is None:
        storage = StorageEngine(config)
    elif storage.list_namespaces():
        raise ValueError("load_storage target engine must be empty")
    for entry in manifest["namespaces"]:
        base = entry["file"]
        with np.load(os.path.join(path, base + ".npz")) as z:
            values = z["values"]
        with open(os.path.join(path, base + ".json")) as f:
            meta = json.load(f)
        snap = {
            "name": meta["name"],
            "dim": meta["dim"],
            "ids": meta["ids"],
            "values": values,
            "metadata": meta["metadata"],
        }
        ns = storage.namespace(meta["name"], create=True).load_snapshot(snap)
        if entry.get("ivf"):
            from ..store.ivf import IVFIndex

            with np.load(os.path.join(path, base + ".ivf.npz")) as z:
                centroids = z["centroids"]
            with open(os.path.join(path, base + ".ivf.json")) as f:
                isnap = json.load(f)
            isnap["centroids"] = centroids
            ns.ivf = IVFIndex.from_snapshot(ns, isnap)
    return storage
