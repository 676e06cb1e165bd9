"""ctypes loader + wrapper for the native runtime (native/metafilter.cpp).

The shared library is auto-built with g++ on first use (cached under native/build/);
everything degrades gracefully to the pure-Python paths when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import json
import logging
import os
import subprocess
import threading
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libmetafilter.so")

_lib = None
_lib_lock = threading.Lock()
_load_failed = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "metafilter.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception as e:  # pragma: no cover - toolchain missing
        logger.warning("native metafilter build failed: %s", e)
        return False


def load() -> Optional[ctypes.CDLL]:
    """The metafilter library, building it on first use; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_SO_PATH) and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:  # pragma: no cover
            logger.warning("native metafilter load failed: %s", e)
            _load_failed = True
            return None
        lib.mf_create.restype = ctypes.c_void_p
        lib.mf_create.argtypes = [ctypes.c_int64]
        lib.mf_destroy.argtypes = [ctypes.c_void_p]
        lib.mf_resize.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.mf_set.restype = ctypes.c_int
        lib.mf_set.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
        lib.mf_clear.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.mf_set_many.restype = ctypes.c_int
        lib.mf_set_many.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.mf_eval.restype = ctypes.c_int64
        lib.mf_eval.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


# ------------------------------------------------------------------ _hydrate extension

_hydrate_mod = None
_hydrate_failed = False
_hydrate_lock = threading.Lock()


def _hydrate_so_path() -> Optional[str]:
    import sysconfig

    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_NATIVE_DIR, "build", f"_hydrate{ext}")


def hydrate_module():
    """The _hydrate CPython extension (native/hydrate.c), auto-built on first use;
    None when no toolchain is available (callers keep the pure-Python path)."""
    global _hydrate_mod, _hydrate_failed
    if _hydrate_mod is not None or _hydrate_failed:
        return _hydrate_mod
    with _hydrate_lock:
        if _hydrate_mod is not None or _hydrate_failed:
            return _hydrate_mod
        so = _hydrate_so_path()
        src = os.path.join(_NATIVE_DIR, "hydrate.c")
        stale = (
            os.path.exists(so) and os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(so)
        )
        if (not os.path.exists(so) or stale) and not _build():
            # a stale .so (source newer) must rebuild, or a new-API caller would
            # load an extension missing the function it was written against
            if not os.path.exists(so):
                _hydrate_failed = True
                return None
        if not os.path.exists(so):  # toolchain built metafilter but not the extension
            _hydrate_failed = True
            return None
        try:
            import importlib.util

            spec = importlib.util.spec_from_file_location("_hydrate", so)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
        except Exception as e:  # pragma: no cover - ABI mismatch etc.
            logger.warning("native _hydrate load failed: %s", e)
            _hydrate_failed = True
            return None
        _hydrate_mod = mod
        return _hydrate_mod


class MetaColumns:
    """Slot-aligned columnar metadata mirror living in the native library.

    The store feeds it on upsert/delete/compact; the filter-mask cache evaluates filter
    specs against it in C++ instead of looping dicts in Python.  Canonical-JSON encoding
    (sort_keys) keeps complex-value equality consistent with Python dict equality.
    """

    def __init__(self, capacity: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native metafilter unavailable")
        self._lib = lib
        self._handle = lib.mf_create(capacity)
        self.capacity = capacity
        self._lock = threading.Lock()

    def __del__(self):
        h = getattr(self, "_handle", None)
        if h:
            self._lib.mf_destroy(h)
            self._handle = None

    def resize(self, new_capacity: int) -> None:
        with self._lock:
            self._lib.mf_resize(self._handle, new_capacity)
            self.capacity = new_capacity

    def set(self, slot: int, metadata: Optional[Dict[str, Any]]) -> bool:
        blob = json.dumps(metadata or {}, sort_keys=True, separators=(",", ":")).encode()
        with self._lock:
            return self._lib.mf_set(self._handle, slot, blob, len(blob)) == 0

    def set_many(self, slots, metadatas) -> bool:
        """Batch set: one native call for a whole upsert batch."""
        blobs = [
            json.dumps(m or {}, sort_keys=True, separators=(",", ":")).encode()
            for m in metadatas
        ]
        concat = b"".join(blobs)
        offsets = np.zeros(len(blobs) + 1, np.int64)
        np.cumsum([len(b) for b in blobs], out=offsets[1:])
        slots_arr = np.asarray(slots, np.int64)
        with self._lock:
            rc = self._lib.mf_set_many(
                self._handle,
                slots_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                concat,
                offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(blobs),
            )
        return rc == 0

    def clear(self, slot: int) -> None:
        with self._lock:
            self._lib.mf_clear(self._handle, slot)

    def eval(self, spec: Dict[str, Any], capacity: Optional[int] = None) -> Optional[np.ndarray]:
        """[capacity] bool mask of slots whose metadata matches, or None if the spec
        could not be evaluated natively (caller falls back to Python)."""
        cap = capacity if capacity is not None else self.capacity
        blob = json.dumps(spec, sort_keys=True, separators=(",", ":")).encode()
        out = np.zeros(cap, np.uint8)
        with self._lock:
            n = self._lib.mf_eval(
                self._handle, blob, len(blob),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
            )
        if n < 0:
            return None
        return out.astype(bool)
