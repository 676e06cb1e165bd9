"""Kernel-level tests: exact kNN vs the numpy oracle (exact equality of neighbour sets).

Generalizes the reference's ranking-against-numpy-oracle pattern
(reference tests/test_query_processor.py:30-33,65-67) down to the kernel layer.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mlvectordb_tpu.ops.topk import exact_knn, merge_topk
from mlvectordb_tpu.ops.distances import MASKED


def _run(q, db, valid, k, metric, db_tile):
    sq = (db.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    return exact_knn(
        jnp.asarray(q), jnp.asarray(db), jnp.asarray(valid), jnp.asarray(sq),
        k=k, metric=metric, db_tile=db_tile,
    )


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
@pytest.mark.parametrize("n,dtile", [(64, 64), (256, 64), (512, 128)])
def test_matches_oracle(rng, oracle, metric, n, dtile):
    dim, k, B = 128, 10, 4
    db = rng.standard_normal((n, dim), dtype=np.float32)
    q = rng.standard_normal((B, dim), dtype=np.float32)
    valid = np.ones(n, bool)

    dist, idx = _run(q, db, valid, k, metric, dtile)
    o_dist, o_idx = oracle(q, db, k, metric)

    np.testing.assert_allclose(np.asarray(dist), o_dist, rtol=2e-4, atol=2e-4)
    # neighbour sets must match exactly (ties may permute within equal scores)
    for b in range(B):
        assert set(np.asarray(idx)[b].tolist()) == set(o_idx[b].tolist())


def test_masked_slots_never_surface(rng):
    n, dim, k = 128, 32, 8
    db = rng.standard_normal((n, dim), dtype=np.float32)
    q = db[:2] + 0.001  # queries near rows 0 and 1
    valid = np.ones(n, bool)
    valid[0] = False  # tombstone the closest row to query 0

    dist, idx = _run(q, db, valid, k, "l2", 64)
    assert 0 not in np.asarray(idx)[0].tolist()
    assert (np.asarray(dist) < MASKED / 2).all()


def test_fewer_live_than_k_pads_with_masked(rng):
    n, dim = 64, 16
    db = rng.standard_normal((n, dim), dtype=np.float32)
    valid = np.zeros(n, bool)
    valid[:3] = True
    q = rng.standard_normal((1, dim), dtype=np.float32)

    dist, idx = _run(q, db, valid, 10, "l2", 64)
    d = np.asarray(dist)[0]
    assert (d[:3] < MASKED / 2).all()
    assert (d[3:] >= MASKED / 2).all()
    assert set(np.asarray(idx)[0, :3].tolist()) <= {0, 1, 2}


def test_results_sorted_best_first(rng, oracle):
    db = rng.standard_normal((256, 64), dtype=np.float32)
    q = rng.standard_normal((3, 64), dtype=np.float32)
    dist, _ = _run(q, db, np.ones(256, bool), 20, "cosine", 64)
    d = np.asarray(dist)
    assert (np.diff(d, axis=1) >= -1e-6).all()


def test_merge_topk_equals_global(rng, oracle):
    db = rng.standard_normal((200, 32), dtype=np.float32)
    q = rng.standard_normal((2, 32), dtype=np.float32)
    k = 7
    # two shards: [0:100), [100:200)
    d1, i1 = _run(q, db[:100], np.ones(100, bool), k, "l2", 64)
    d2, i2 = _run(q, db[100:], np.ones(100, bool), k, "l2", 64)
    i2 = jnp.asarray(np.asarray(i2) + 100)
    md, mi = merge_topk(d1, i1, d2, i2, k=k)
    o_dist, o_idx = oracle(q, db, k, "l2")
    np.testing.assert_allclose(np.asarray(md), o_dist, rtol=2e-4, atol=2e-4)
    for b in range(2):
        assert set(np.asarray(mi)[b].tolist()) == set(o_idx[b].tolist())


def test_bfloat16_storage_still_finds_neighbors(rng):
    # bf16 halves HBM traffic; scores are f32-accumulated, sets may differ slightly for
    # near-ties, but a planted exact-match neighbour must always rank first.
    n, dim = 256, 64
    db = rng.standard_normal((n, dim), dtype=np.float32)
    q = db[[5, 17]].copy()
    dist, idx = _run(q, db.astype(jnp.bfloat16), np.ones(n, bool), 5, "cosine", 64)
    assert np.asarray(idx)[0, 0] == 5
    assert np.asarray(idx)[1, 0] == 17


def test_odd_tile_sizes_stay_chunked(rng, oracle):
    # cap not a multiple of db_tile: pad-to-tiles path (never a [B, cap] one-shot)
    n, dim, k = 500, 32, 7
    db = rng.standard_normal((n, dim), dtype=np.float32)
    q = rng.standard_normal((3, dim), dtype=np.float32)
    dist, idx = _run(q, db, np.ones(n, bool), k, "l2", 150)
    o_dist, o_idx = oracle(q, db, k, "l2")
    np.testing.assert_allclose(np.asarray(dist), o_dist, rtol=2e-4, atol=2e-4)
    for b in range(3):
        assert set(np.asarray(idx)[b].tolist()) == set(o_idx[b].tolist())
