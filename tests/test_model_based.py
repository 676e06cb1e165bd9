"""Model-based fuzzing: random operation sequences vs a naive reference model.

The engine (device arrays, tombstones, compaction, bucketing, caches, native filter
masks) must be observationally equivalent to a trivial model (dict of rows + numpy brute
force) under any interleaving of upsert / overwrite / delete / compact / snapshot /
search / range / filter operations.  Since the engine is exact, every comparison is an
equality on neighbour SETS (ties may permute) — no tolerance fudging.

This generalizes the reference suite's single-scenario oracle tests (SURVEY.md §4) into a
randomized invariant check.
"""

import random
import uuid

import numpy as np
import pytest

from mlvectordb_tpu import QueryProcessor, VectorDTO
from mlvectordb_tpu.config import HIGHER_IS_BETTER
from mlvectordb_tpu.filters import matches_filter


class NaiveModel:
    """Dict-of-rows + numpy brute force: obviously-correct semantics."""

    def __init__(self):
        self.ns = {}  # name -> {uuid: (values, metadata)}

    def upsert(self, name, items):
        self.ns.setdefault(name, {})
        for vid, vals, meta in items:
            self.ns[name][vid] = (vals, meta)

    def delete(self, name, ids):
        removed = []
        for vid in ids:
            if vid in self.ns.get(name, {}):
                del self.ns[name][vid]
                removed.append(vid)
        if name in self.ns and not self.ns[name]:
            del self.ns[name]
        return removed

    def search(self, name, q, k, metric, flt=None):
        rows = [
            (vid, vals)
            for vid, (vals, meta) in self.ns.get(name, {}).items()
            if matches_filter(meta or {}, flt)
        ]
        if not rows or k <= 0:
            return []
        db = np.stack([r[1] for r in rows])
        dots = db @ q
        if metric == "l2":
            d = ((db - q) ** 2).sum(-1)
        elif metric == "ip":
            d = 1.0 - dots
        else:
            d = 1.0 - dots / np.maximum(
                np.linalg.norm(db, axis=1) * np.linalg.norm(q), 1e-30
            )
        order = np.argsort(d, kind="stable")[:k]
        return [(rows[i][0], float(d[i])) for i in order]


def _make_qp(kind, config):
    if kind == "sharded":
        from mlvectordb_tpu.parallel import make_distributed_processor

        return make_distributed_processor(2, 4, config)
    return QueryProcessor(config=config)


@pytest.mark.parametrize("kind", ["single", "sharded"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_operation_sequences(small_config, seed, kind):
    rnd = random.Random(seed)
    nprng = np.random.default_rng(seed)
    dim = 12
    qp = _make_qp(kind, small_config)
    model = NaiveModel()
    namespaces = ["a", "b"]
    all_ids = []

    def rand_meta(i):
        return {"i": i, "grp": rnd.choice(["x", "y", "z"]), "f": rnd.random()}

    for step in range(120):
        op = rnd.random()
        name = rnd.choice(namespaces)
        if op < 0.35:  # batch insert
            n = rnd.randint(1, 12)
            items = []
            dtos = []
            for j in range(n):
                vid = uuid.uuid4()
                vals = nprng.standard_normal(dim).astype(np.float32)
                meta = rand_meta(step * 100 + j)
                items.append((vid, vals, meta))
                dtos.append(VectorDTO(vals, meta, id=vid))
                all_ids.append((name, vid))
            qp.upsert_many(dtos, name)
            model.upsert(name, items)
        elif op < 0.45 and all_ids:  # overwrite existing
            name, vid = rnd.choice(all_ids)
            vals = nprng.standard_normal(dim).astype(np.float32)
            meta = rand_meta(step)
            qp.upsert_many([VectorDTO(vals, meta, id=vid)], name)
            model.upsert(name, [(vid, vals, meta)])
        elif op < 0.6 and all_ids:  # delete a few (may include ghosts)
            picks = [rnd.choice(all_ids) for _ in range(rnd.randint(1, 5))]
            ids = [vid for _, vid in picks if rnd.random() < 0.9] + [uuid.uuid4()]
            removed = qp.delete(ids, name)
            expect = model.delete(name, ids)
            assert set(removed) == set(expect), f"step {step}"
        elif op < 0.63:  # explicit compaction
            ns = qp.storage.namespace(name)
            if ns is not None:
                ns.compact()
        elif op < 0.66:  # vectorized bulk ingestion path
            n = rnd.randint(1, 20)
            vals = nprng.standard_normal((n, dim)).astype(np.float32)
            metas = [rand_meta(step * 1000 + j) for j in range(n)]
            new_ids = qp.bulk_load(vals, name, metadatas=metas)
            model.upsert(name, list(zip(new_ids, vals, metas)))
            all_ids.extend((name, vid) for vid in new_ids)
        elif op < 0.7 and kind == "single":  # snapshot round-trip mid-sequence
            import tempfile

            with tempfile.TemporaryDirectory() as td:
                qp.save(td)
                qp = QueryProcessor.load(td, small_config)
        else:  # search and compare against the model
            q = nprng.standard_normal(dim).astype(np.float32)
            metric = rnd.choice(["l2", "ip", "cosine"])
            k = rnd.randint(1, 8)
            flt = rnd.choice(
                [None, None, {"grp": "x"}, {"i": {"$gte": 0}}, {"f": {"$lt": 0.5}}]
            )
            got = qp.find_similar(VectorDTO(q), k, name, metric, filter=flt)
            want = model.search(name, q, k, metric, flt)
            assert len(got) == len(want), f"step {step}: {len(got)} vs {len(want)}"
            # set equality on ids at each distinct score level (ties may permute)
            got_ids = [r["id"] for r in got]
            want_ids = [w[0] for w in want]
            if got_ids != want_ids:
                # permit permutations among equal scores only
                gs = [round(r["score"], 4) for r in got]
                ws = [
                    round(1.0 - w[1], 4) if HIGHER_IS_BETTER[metric] else round(w[1], 4)
                    for w in want
                ]
                assert gs == ws, f"step {step}: scores {gs} vs {ws}"
                assert set(got_ids) == set(want_ids), f"step {step}"

    # final deep comparison: every namespace's full content matches
    for name in namespaces:
        model_rows = model.ns.get(name, {})
        assert qp.get_namespace_count(name) == len(model_rows)
        for vid, (vals, meta) in model_rows.items():
            got = qp.storage.read(vid, name)
            assert got is not None
            np.testing.assert_array_equal(got.values, vals)
            assert got.metadata == meta
    from mlvectordb_tpu.utils.health import check_store_invariants

    assert check_store_invariants(qp.storage)["ok"]
