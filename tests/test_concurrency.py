"""Concurrency: searches are lock-free snapshot reads; writes are single-writer.

The reference has zero synchronization and calls blocking code from async handlers
(SURVEY.md §5.2); correctness under concurrent mutation is undefined there.  Here the
contract is: a search never crashes, never returns a masked/garbage hit, and every id it
returns was live at SOME point during the search (functional device arrays snapshot the
state; host tables may race benignly and the hydration consistency guard drops vanished
hits — reference semantics, query_processor.py:38-49).
"""

import threading
import uuid

import numpy as np
import pytest

from mlvectordb_tpu import QueryProcessor, VectorDTO


def test_concurrent_searches_and_writes(small_config, rng):
    qp = QueryProcessor(config=small_config)
    dim = 16
    base = qp.upsert_many(
        [VectorDTO(rng.standard_normal(dim).astype(np.float32), {"gen": 0}) for _ in range(100)],
        "ns",
    )
    ever_inserted = {v.id for v in base}
    stop = threading.Event()
    errors = []

    def writer():
        local_rng = np.random.default_rng(1)
        generation = 1
        live = list(base)
        try:
            while not stop.is_set():
                vs = qp.upsert_many(
                    [
                        VectorDTO(local_rng.standard_normal(dim).astype(np.float32),
                                  {"gen": generation})
                        for _ in range(10)
                    ],
                    "ns",
                )
                ever_inserted.update(v.id for v in vs)
                live.extend(vs)
                if len(live) > 150:
                    victims = live[:20]
                    live = live[20:]
                    qp.delete([v.id for v in victims], "ns")
                generation += 1
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def searcher(seed):
        local_rng = np.random.default_rng(seed)
        try:
            for _ in range(30):
                q = VectorDTO(local_rng.standard_normal(dim).astype(np.float32))
                res = qp.find_similar(q, top_k=10, namespace="ns", metric="l2")
                for r in res:
                    assert isinstance(r["id"], uuid.UUID)
                    assert np.isfinite(r["score"])
                    assert r["id"] in ever_inserted
                    assert r["values"].shape == (dim,)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    w = threading.Thread(target=writer)
    searchers = [threading.Thread(target=searcher, args=(100 + i,)) for i in range(4)]
    w.start()
    for s in searchers:
        s.start()
    for s in searchers:
        s.join(timeout=120)
    stop.set()
    w.join(timeout=120)

    assert not errors, errors
    # engine still consistent afterwards
    from mlvectordb_tpu.utils.health import check_store_invariants

    assert check_store_invariants(qp.storage)["ok"]


def test_concurrent_writers_serialize(small_config, rng):
    """Two writer threads hammer the same namespace; final state must be consistent."""
    qp = QueryProcessor(config=small_config)
    dim = 8
    errors = []

    def writer(seed):
        local = np.random.default_rng(seed)
        try:
            for i in range(20):
                vs = qp.upsert_many(
                    [VectorDTO(local.standard_normal(dim).astype(np.float32)) for _ in range(5)],
                    "ns",
                )
                if i % 3 == 0:
                    qp.delete([vs[0].id], "ns")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    ts = [threading.Thread(target=writer, args=(s,)) for s in (1, 2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert not errors, errors

    ns = qp.storage.namespace("ns")
    expected = 2 * (20 * 5 - 7)  # each writer: 100 inserts, 7 deletes
    assert ns.live_count == expected
    # every live id resolves and is searchable
    res = qp.find_similar(
        VectorDTO(np.zeros(dim, np.float32)), top_k=expected, namespace="ns"
    )
    assert len(res) == expected


def test_ivf_searches_race_retrain(small_config, rng):
    """ADVICE r2 (medium): lock-free nprobe searches racing an auto-retrain must never
    see a torn index generation (new centroids probing old cluster arrays, or old-layout
    slots resolved against a relaid-out slot table -> wrong/empty ids).  Every hit must
    be an id that was inserted, carrying that id's OWN vector payload."""
    import dataclasses

    # low threshold + no result cache: a retrain fires on nearly every writer round and
    # every search actually probes the device index
    qp = QueryProcessor(
        config=dataclasses.replace(small_config, rebuild_threshold=0.05, result_cache_size=0)
    )
    dim = 16
    centers = rng.standard_normal((8, dim)).astype(np.float32) * 10
    rows = np.concatenate(
        [c + 0.1 * rng.standard_normal((40, dim)).astype(np.float32) for c in centers]
    )
    vs = qp.upsert_many([VectorDTO(r, {"i": i}) for i, r in enumerate(rows)], "ns")
    qp.build_ivf("ns", n_clusters=8, n_iters=5, seed=0)
    ivf0 = qp.storage.namespace("ns").ivf
    by_id = {v.id: np.asarray(v.values) for v in vs}
    by_id_lock = threading.Lock()
    stop = threading.Event()
    errors = []

    def writer():
        """Overwrite vectors into far-away clusters: drift crosses rebuild_threshold
        repeatedly, firing retrain() (the swap under test) many times."""
        local = np.random.default_rng(7)
        try:
            gen = 0
            while not stop.is_set() or gen < 6:  # at least 6 rounds even if searchers finish fast
                idx = local.integers(0, len(vs), 30)
                dtos = []
                for i in idx:
                    target = centers[(gen + 4) % 8] + 0.1 * local.standard_normal(dim)
                    dtos.append(VectorDTO(target.astype(np.float32), {"moved": gen}, id=vs[i].id))
                got = qp.upsert_many(dtos, "ns")
                with by_id_lock:
                    for v in got:
                        by_id[v.id] = np.asarray(v.values)
                gen += 1
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def searcher(seed):
        local = np.random.default_rng(seed)
        try:
            for _ in range(60):
                q = centers[local.integers(0, 8)] + 0.1 * local.standard_normal(dim)
                res = qp.find_similar(
                    VectorDTO(q.astype(np.float32)), top_k=5, namespace="ns",
                    metric="l2", nprobe=3,
                )
                for r in res:
                    assert isinstance(r["id"], uuid.UUID)
                    assert r["id"] in by_id, "IVF returned an id that was never inserted"
                    assert np.isfinite(r["score"])
                    assert r["values"].shape == (dim,)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    w = threading.Thread(target=writer)
    ss = [threading.Thread(target=searcher, args=(200 + i,)) for i in range(3)]
    w.start()
    for s in ss:
        s.start()
    for s in ss:
        s.join(timeout=180)
    stop.set()
    w.join(timeout=180)
    assert not errors, errors
    # at least one retrain actually fired during the run (the race under test existed):
    # retrain publishes a FRESH index object into ns.ivf
    ivf = qp.storage.namespace("ns").ivf
    assert ivf is not None and ivf.live_count == len(vs)
    assert ivf is not ivf0, "no retrain fired; the test exercised nothing"
