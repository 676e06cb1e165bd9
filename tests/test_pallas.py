"""Pallas fused-kNN backend tests.

On the CPU test harness the kernel runs in Pallas interpret mode (bit-accurate kernel
semantics, no Mosaic); on a real TPU the same tests exercise the compiled kernel.  Results
must exactly match the pure-XLA scan backend and the numpy oracle — the fused path is
exact by construction (margin selection + full-precision rescan, see
mlvectordb_tpu/ops/pallas_knn.py docstring).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mlvectordb_tpu.ops.pallas_knn import DB_TILE, exact_knn_pallas
from mlvectordb_tpu.ops.topk import exact_knn

N = 2 * DB_TILE  # minimum size for the fused path
D = 128


def _mk(rng, n=N, d=D):
    db = rng.standard_normal((n, d), dtype=np.float32)
    sq = (db.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    return jnp.asarray(db), jnp.asarray(sq)


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_matches_scan_backend(rng, metric):
    db, sq = _mk(rng)
    q = jnp.asarray(rng.standard_normal((8, D), dtype=np.float32))
    valid = jnp.ones((N,), jnp.bool_)
    dp, ipx = exact_knn_pallas(q, db, valid, sq, k=5, metric=metric, live_prefix=N)
    da, ia = exact_knn(q, db, valid, sq, k=5, metric=metric, db_tile=DB_TILE)
    for b in range(8):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist())
    np.testing.assert_allclose(
        np.sort(np.asarray(dp), 1), np.sort(np.asarray(da), 1), rtol=1e-4, atol=1e-4
    )


def test_masked_variant_excludes_tombstones(rng):
    db, sq = _mk(rng)
    q = jnp.asarray(np.asarray(db[5:13]) + 0.001)
    valid = np.ones(N, bool)
    valid[5] = False  # tombstone the closest row to query 0
    dp, ipx = exact_knn_pallas(q, db, jnp.asarray(valid), sq, k=3, metric="l2", live_prefix=None)
    assert 5 not in np.asarray(ipx)[0].tolist()
    assert np.asarray(ipx)[1, 0] == 6


def test_fast_variant_masks_unwritten_tail(rng):
    db, sq = _mk(rng)
    hw = 1000
    q = jnp.asarray(rng.standard_normal((8, D), dtype=np.float32))
    valid = np.zeros(N, bool)
    valid[:hw] = True
    dp, ipx = exact_knn_pallas(q, db, jnp.asarray(valid), sq, k=7, metric="l2", live_prefix=hw)
    da, ia = exact_knn(q, db, jnp.asarray(valid), sq, k=7, metric="l2", db_tile=DB_TILE)
    for b in range(8):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist())
        assert (np.asarray(ipx)[b] < hw).all()


def test_small_capacity_falls_back_to_scan(rng):
    db, sq = _mk(rng, n=256)
    q = jnp.asarray(rng.standard_normal((4, D), dtype=np.float32))
    valid = jnp.ones((256,), jnp.bool_)
    dp, ipx = exact_knn_pallas(q, db, valid, sq, k=3, metric="l2", live_prefix=256)
    da, ia = exact_knn(q, db, valid, sq, k=3, metric="l2", db_tile=256)
    np.testing.assert_array_equal(np.asarray(ipx), np.asarray(ia))
