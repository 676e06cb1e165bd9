"""Backend dispatch: fused Pallas kernel on TPU, pure-XLA scan elsewhere.

Both backends share one signature and produce identical (exact) results:
    backend(q, data, valid, sq_norms, *, k, metric, db_tile, live_prefix) -> (dist, idx)

``live_prefix`` is a host-known hint that rows [0, live_prefix) are exactly the live rows
(no tombstones; no filter active).  The Pallas fast path uses it to skip all mask traffic;
the scan backend ignores it (``valid`` is authoritative there).
"""

from __future__ import annotations

import jax

from ..config import EngineConfig
from .topk import exact_knn

_warned = False


def _scan_backend(q, data, valid, sq_norms, *, k, metric, db_tile, live_prefix=None,
                  data_t=None, sweep_err=None, sweep_resid=None, sweep_rscale=None,
                  sweep_err1=None, sweep_rscale2=None, report_tier=False,
                  sweep_light=False, sweep_prep=None):
    d, i = exact_knn(q, data, valid, sq_norms, k=k, metric=metric, db_tile=db_tile)
    if report_tier:
        import jax.numpy as jnp

        return d, i, jnp.int32(-1)  # no certificate ran: the scan IS the exact path
    return d, i


_scan_backend.__name__ = "exact_knn_scan"


def knn_backend(config: EngineConfig):
    global _warned
    if config.use_pallas and jax.default_backend() == "tpu":
        try:
            from .pallas_knn import exact_knn_pallas
            from .pallas_knn_t import exact_knn_pallas_t

            certify = config.certify_exact

            def tpu_backend(q, data, valid, sq_norms, *, k, metric, db_tile,
                            live_prefix=None, data_t=None, sweep_err=None,
                            sweep_resid=None, sweep_rscale=None, sweep_err1=None,
                            sweep_rscale2=None, report_tier=False, sweep_light=False,
                            sweep_prep=None, sweep_prep_direct=None):
                # transposed sweep mirror present (config.sweep_dtype): roofline path —
                # phase 1 reads data_t, the exact rescan reads the row-major store.
                # sweep_prep_direct: an explicit search_prep dict for traced callers
                # (the snapshot cache only populates eagerly)
                if data_t is not None:
                    return exact_knn_pallas_t(
                        q, data_t, data, valid, sq_norms,
                        k=k, metric=metric, live_prefix=live_prefix,
                        sweep_err=sweep_err, resid=sweep_resid,
                        rscale=sweep_rscale, err1=sweep_err1, rscale2=sweep_rscale2,
                        certify=certify, report_tier=report_tier, light=sweep_light,
                        prep_cache=sweep_prep, prep=sweep_prep_direct,
                    )
                d, i = exact_knn_pallas(
                    q, data, valid, sq_norms,
                    k=k, metric=metric, db_tile=db_tile, live_prefix=live_prefix,
                )
                if report_tier:
                    import jax.numpy as jnp

                    return d, i, jnp.int32(-1)  # row-major margin kernel: no certificate
                return d, i

            tpu_backend.__name__ = "exact_knn_pallas"
            return tpu_backend
        except Exception:  # pragma: no cover - pallas unavailable / import failure
            if not _warned:
                import logging

                logging.getLogger(__name__).warning(
                    "pallas kernel unavailable; falling back to XLA scan backend"
                )
                _warned = True
    return _scan_backend
