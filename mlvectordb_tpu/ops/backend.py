"""Backend dispatch: fused Pallas kernel on TPU, pure-XLA scan elsewhere.

Both backends share one signature and produce identical (exact) results:
    backend(q, data, valid, sq_norms, *, k, metric, db_tile) -> (dist [B,k], idx [B,k])
"""

from __future__ import annotations

import jax

from ..config import EngineConfig
from .topk import exact_knn

_warned = False


def knn_backend(config: EngineConfig):
    global _warned
    if config.use_pallas and jax.default_backend() == "tpu":
        try:
            from .pallas_knn import exact_knn_pallas

            return exact_knn_pallas
        except Exception:  # pragma: no cover - pallas unavailable / import failure
            if not _warned:
                import logging

                logging.getLogger(__name__).warning(
                    "pallas kernel unavailable; falling back to XLA scan backend"
                )
                _warned = True
    return exact_knn
