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
