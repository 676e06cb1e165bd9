"""Native C++ metadata-filter engine: exact semantic parity with the Python evaluator.

The native layer replaces the host-side hot loop (filter spec -> slot bitmask) the way
the reference's hnswlib replaced its distance loop (SURVEY.md §2.1) — and like the
reference's components it must be behaviourally indistinguishable from the contract:
here, bit-identical masks to filters.matches_filter over randomized metadata + specs.
"""

import random

import numpy as np
import pytest

from mlvectordb_tpu.filters import matches_filter

native = pytest.importorskip("mlvectordb_tpu.native")
if not native.available():  # pragma: no cover
    pytest.skip("native metafilter not buildable here", allow_module_level=True)


def make_store(metas):
    mc = native.MetaColumns(len(metas))
    for i, m in enumerate(metas):
        assert mc.set(i, m)
    return mc


def check(metas, spec, allow_fallback=False):
    mc = make_store(metas)
    got = mc.eval(spec)
    if got is None:
        # the native grammar deliberately rejects some Python-only semantics (e.g.
        # sequence-vs-sequence ordering) -> callers fall back to matches_filter
        assert allow_fallback, f"native unexpectedly failed to parse {spec}"
        return
    want = np.asarray([matches_filter(m or {}, spec) for m in metas])
    np.testing.assert_array_equal(got, want), (spec, metas)


METAS = [
    {},
    {"color": "red", "n": 5},
    {"color": "blue", "n": 2.5, "active": True},
    {"color": "red", "n": -1, "active": False},
    {"n": True},          # bool/number interop: True == 1
    {"n": 0},
    {"n": None},
    {"tag": "zebra"},
    {"tag": "apple", "n": 5},
    {"nested": {"a": {"b": 3}}, "arr": [1, 2, {"x": None}]},
    {"nested": {"a": {"b": "s"}}},
    {"mixed": "5"},       # string "5" vs number 5: never equal
    {"mixed": 5},
]

SPECS = [
    {"color": "red"},
    {"color": {"$ne": "red"}},
    {"n": {"$gt": 0}},
    {"n": {"$gte": 2.5}},
    {"n": {"$lt": 5}},
    {"n": {"$lte": True}},
    {"n": 1},                      # matches {"n": True}
    {"n": {"$in": [5, 2.5, "x"]}},
    {"n": {"$nin": [5]}},
    {"n": {"$exists": True}},
    {"n": {"$exists": False}},
    {"n": None},
    {"tag": {"$gt": "m"}},         # string ordering
    {"tag": {"$lt": "m"}},
    {"mixed": {"$gt": 3}},         # "5" > 3 -> TypeError -> False; 5 > 3 -> True
    {"mixed": "5"},
    {"nested.a.b": 3},
    {"nested.a.b": {"$gte": 3}},
    {"nested.a": {"b": 3}},        # complex-value equality via canonical JSON
    {"arr": [1, 2, {"x": None}]},
    {"$and": [{"color": "red"}, {"n": {"$gt": 0}}]},
    {"$or": [{"color": "blue"}, {"tag": "zebra"}]},
    {"$not": {"color": "red"}},
    {"$or": [{"$and": [{"n": {"$gte": 0}}, {"n": {"$lt": 3}}]}, {"$not": {"n": {"$exists": True}}}]},
    {"color": "red", "n": {"$gt": 0, "$lt": 10}},
    {},
]


@pytest.mark.parametrize("spec", SPECS, ids=[str(s)[:50] for s in SPECS])
def test_parity_on_curated_cases(spec):
    check(METAS, spec)


def test_parity_randomized():
    rnd = random.Random(42)
    fields = ["a", "b", "c", "d.e"]
    values = [0, 1, -3.5, True, False, None, "x", "y", "long string", [1, 2], {"k": 1}]
    ops = ["$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin", "$exists"]

    def rand_meta():
        m = {}
        for f in rnd.sample(["a", "b", "c"], rnd.randint(0, 3)):
            m[f] = rnd.choice(values)
        if rnd.random() < 0.3:
            m["d"] = {"e": rnd.choice(values[:9])}
        return m

    def rand_leaf():
        f = rnd.choice(fields)
        op = rnd.choice(ops)
        if op == "$exists":
            return {f: {"$exists": rnd.choice([True, False])}}
        if op in ("$in", "$nin"):
            return {f: {op: rnd.sample(values[:9], rnd.randint(0, 3))}}
        return {f: {op: rnd.choice(values)}}

    def rand_spec(depth=0):
        r = rnd.random()
        if depth < 2 and r < 0.25:
            return {"$and": [rand_spec(depth + 1) for _ in range(rnd.randint(1, 3))]}
        if depth < 2 and r < 0.45:
            return {"$or": [rand_spec(depth + 1) for _ in range(rnd.randint(1, 3))]}
        if depth < 2 and r < 0.55:
            return {"$not": rand_spec(depth + 1)}
        return rand_leaf()

    metas = [rand_meta() for _ in range(80)]
    for _ in range(150):
        check(metas, rand_spec(), allow_fallback=True)


def test_clear_and_overwrite():
    mc = native.MetaColumns(4)
    mc.set(0, {"a": 1})
    mc.set(1, {"a": 2})
    assert mc.eval({"a": 1}).tolist() == [True, False, False, False]
    mc.set(0, {"b": 9})  # overwrite wipes previous fields
    assert mc.eval({"a": 1}).tolist() == [False, False, False, False]
    assert mc.eval({"b": 9}).tolist() == [True, False, False, False]
    mc.clear(1)
    assert mc.eval({"a": {"$exists": True}}).tolist() == [False, False, False, False]


def test_resize_preserves_data():
    mc = native.MetaColumns(2)
    mc.set(0, {"a": 1})
    mc.resize(8)
    mc.set(5, {"a": 1})
    assert mc.eval({"a": 1}).tolist() == [True, False, False, False, False, True, False, False]


def test_unknown_operator_returns_none():
    mc = make_store([{"a": 1}])
    assert mc.eval({"a": {"$regex": "x"}}) is None


def test_engine_uses_native_mask(small_config, rng):
    """Through the stack: hybrid search results identical whether or not the native
    evaluator is active for the namespace."""
    from mlvectordb_tpu import QueryProcessor, VectorDTO

    qp = QueryProcessor(config=small_config)
    vs = qp.upsert_many(
        [
            VectorDTO(rng.standard_normal(8).astype(np.float32), {"i": i, "odd": bool(i % 2)})
            for i in range(40)
        ],
        "ns",
    )
    ns = qp.storage.namespace("ns")
    assert ns.meta_columns is not None  # native mirror active
    q = VectorDTO(rng.standard_normal(8).astype(np.float32))
    native_res = qp.find_similar(q, top_k=40, namespace="ns", filter={"odd": True})

    ns.meta_columns = None  # force Python path; bust the cache via a fresh processor
    qp._filter_masks._cache.clear()
    python_res = qp.find_similar(q, top_k=40, namespace="ns", filter={"odd": True})
    assert [r["id"] for r in native_res] == [r["id"] for r in python_res]
    assert len(native_res) == 20


def test_set_many_matches_individual_sets():
    metas = [{"i": i, "grp": "x" if i % 2 else "y"} for i in range(10)]
    a = native.MetaColumns(10)
    assert a.set_many(list(range(10)), metas)
    b = make_store(metas)
    for spec in ({"grp": "x"}, {"i": {"$gte": 5}}, {"i": 3}):
        np.testing.assert_array_equal(a.eval(spec), b.eval(spec))
