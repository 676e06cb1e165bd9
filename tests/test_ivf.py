"""IVF approximate index: k-means quantizer, probe search, engine integration.

The reference's index is approximate (hnswlib HNSW with unmeasured recall — SURVEY.md
§2.1); IVF is this engine's opt-in approximate counterpart.  Key invariant: probing ALL
clusters degenerates to exact search — which gives us an oracle for correctness, while
recall tests use clustered data where small nprobe must still find planted neighbours.
"""

import numpy as np
import pytest

from mlvectordb_tpu import QueryProcessor, VectorDTO
from mlvectordb_tpu.ops.kmeans import assign_clusters, train_kmeans, update_centroids


def clustered_data(rng, n_clusters=8, per=40, dim=16, spread=0.05):
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 3
    rows = np.concatenate(
        [c + spread * rng.standard_normal((per, dim)).astype(np.float32) for c in centers]
    )
    return rows, centers


def dto(vals, meta=None, vid=None):
    return VectorDTO(values=vals, metadata=meta, id=vid)


# ------------------------------------------------------------------------- k-means


def test_kmeans_recovers_clusters(rng):
    import jax.numpy as jnp

    rows, centers = clustered_data(rng)
    data = jnp.asarray(rows)
    valid = jnp.ones((rows.shape[0],), bool)
    cents, assign = train_kmeans(data, valid, n_clusters=8, n_iters=15, seed=1)
    a = np.asarray(assign)
    # same-generated-cluster rows end up together
    for g in range(8):
        block = a[g * 40 : (g + 1) * 40]
        assert (block == block[0]).all()
    # recovered centroids are near true centers (in some permutation)
    c = np.asarray(cents)
    d = ((c[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    assert (d.min(axis=0) < 0.1).all()


def test_kmeans_update_step_is_cluster_mean(rng):
    import jax.numpy as jnp

    rows = rng.standard_normal((100, 8)).astype(np.float32)
    assign = jnp.asarray(rng.integers(0, 4, 100).astype(np.int32))
    cents, counts = update_centroids(jnp.asarray(rows), assign, n_clusters=4)
    a = np.asarray(assign)
    for c in range(4):
        sel = rows[a == c]
        assert counts[c] == len(sel)
        np.testing.assert_allclose(np.asarray(cents)[c], sel.mean(0), rtol=1e-5, atol=1e-5)


def test_assign_respects_validity(rng):
    import jax.numpy as jnp

    rows = rng.standard_normal((64, 8)).astype(np.float32)
    valid = np.ones(64, bool)
    valid[10] = False
    cents = jnp.asarray(rows[:4])
    a, _ = assign_clusters(jnp.asarray(rows), jnp.asarray(valid), cents)
    assert np.asarray(a)[10] == -1
    assert (np.asarray(a)[:4] == np.arange(4)).all()  # centroid rows map to themselves


# ------------------------------------------------------------------------- IVF engine


@pytest.fixture
def ivf_qp(small_config, rng):
    qp = QueryProcessor(config=small_config)
    rows, _ = clustered_data(rng, n_clusters=8, per=40, dim=16)
    vs = qp.upsert_many([dto(r, {"i": i}) for i, r in enumerate(rows)], "ns")
    stats = qp.build_ivf("ns", n_clusters=8, n_iters=10, seed=0)
    assert stats["clusters"] == 8 and stats["live"] == len(vs)
    return qp, vs, rows


def test_full_probe_matches_exact(ivf_qp):
    qp, vs, rows = ivf_qp
    q = dto(rows[5])
    exact = qp.find_similar(q, top_k=10, namespace="ns", metric="l2")
    approx = qp.find_similar(q, top_k=10, namespace="ns", metric="l2", nprobe=8)
    assert [r["id"] for r in exact] == [r["id"] for r in approx]
    for e, a in zip(exact, approx):
        assert a["score"] == pytest.approx(e["score"], rel=1e-4, abs=1e-4)


def test_small_nprobe_finds_planted_neighbor(ivf_qp, rng):
    qp, vs, rows = ivf_qp
    # query very close to a stored vector: its cluster must be probed first
    for i in (3, 77, 200, 319):
        q = dto(rows[i] + 0.001 * rng.standard_normal(16).astype(np.float32))
        res = qp.find_similar(q, top_k=1, namespace="ns", metric="l2", nprobe=1)
        assert res[0]["id"] == vs[i].id


def test_recall_at_small_nprobe(ivf_qp, rng):
    qp, vs, rows = ivf_qp
    hits = total = 0
    for _ in range(20):
        q = rng.standard_normal(16).astype(np.float32)
        exact = {r["id"] for r in qp.find_similar(dto(q), 5, "ns", "l2")}
        approx = {r["id"] for r in qp.find_similar(dto(q), 5, "ns", "l2", nprobe=2)}
        hits += len(exact & approx)
        total += len(exact)
    assert hits / total >= 0.6  # random queries, 2/8 clusters probed


def test_ivf_tracks_mutations(ivf_qp, rng):
    qp, vs, rows = ivf_qp
    ns = qp.storage.namespace("ns")
    # insert a new vector: must be findable through IVF without rebuild
    nv = qp.insert(dto(rows[0] * 0.999 + 0.001, {"new": True}), "ns")
    res = qp.find_similar(dto(nv.values), top_k=1, namespace="ns", nprobe=2)
    assert res[0]["id"] == nv.id
    # delete: must disappear from IVF results
    qp.delete([vs[10].id], "ns")
    res = qp.find_similar(dto(rows[10]), top_k=5, namespace="ns", nprobe=8)
    assert vs[10].id not in [r["id"] for r in res]
    # overwrite by id: new values served
    qp.upsert_many([dto(rows[20] + 5.0, {"v": 2}, vs[20].id)], "ns")
    res = qp.find_similar(dto(rows[20] + 5.0), top_k=1, namespace="ns", nprobe=8)
    assert res[0]["id"] == vs[20].id
    assert ns.ivf.live_count == ns.live_count


def test_nprobe_with_filter_falls_back_to_exact(ivf_qp):
    qp, vs, rows = ivf_qp
    res = qp.find_similar(
        dto(rows[0]), top_k=5, namespace="ns", nprobe=1, filter={"i": {"$lt": 100}}
    )
    assert len(res) == 5
    assert all(r["metadata"]["i"] < 100 for r in res)


def test_nprobe_without_index_uses_exact(small_config, rng):
    qp = QueryProcessor(config=small_config)
    vs = qp.upsert_many([dto(rng.standard_normal(8).astype(np.float32)) for _ in range(20)], "ns")
    res = qp.find_similar(dto(vs[0].values), top_k=1, namespace="ns", nprobe=4)
    assert res[0]["id"] == vs[0].id  # silently exact


def test_drop_ivf(ivf_qp):
    qp, vs, rows = ivf_qp
    assert qp.drop_ivf("ns") is True
    assert qp.drop_ivf("ns") is False
    res = qp.find_similar(dto(rows[0]), top_k=1, namespace="ns", nprobe=1)
    assert res[0]["id"] == vs[0].id  # exact path again


def test_ivf_stats_and_statistics_kind(ivf_qp):
    qp, vs, rows = ivf_qp
    ns = qp.storage.namespace("ns")
    st = ns.ivf.stats()
    assert st["live"] == ns.live_count
    assert st["fill_max"] <= st["cluster_capacity"]
    qp.find_similar(dto(rows[0]), top_k=1, namespace="ns", nprobe=2)
    assert qp.get_statistics()["queries_by_type"].get("ivf", 0) >= 1


def test_ivf_skewed_clusters_overflow_placement(small_config, rng):
    """90% of rows in one blob: overflow rows land nearest-with-space (no crash), the
    index stays complete, and full-probe search remains exact."""
    blob = rng.standard_normal((180, 8)).astype(np.float32) * 0.05 + 5.0
    rest = rng.standard_normal((20, 8)).astype(np.float32) - 5.0
    rows = np.concatenate([blob, rest])
    qp = QueryProcessor(config=small_config)
    vs = qp.upsert_many([dto(r) for r in rows], "ns")
    stats = qp.build_ivf("ns", n_clusters=8, n_iters=8, seed=3)
    ns = qp.storage.namespace("ns")
    assert ns.ivf.live_count == 200  # every row placed despite the skew
    assert stats["fill_max"] <= stats["cluster_capacity"]
    # full probe == exact
    q = dto(rows[7])
    exact = qp.find_similar(q, top_k=10, namespace="ns", metric="l2")
    full = qp.find_similar(q, top_k=10, namespace="ns", metric="l2", nprobe=8)
    assert [r["id"] for r in exact] == [r["id"] for r in full]
    # queries in the small blob still resolve at tiny nprobe
    res = qp.find_similar(dto(rows[190]), top_k=1, namespace="ns", nprobe=1)
    assert res[0]["id"] == vs[190].id


# ------------------------------------------------------------------------- persistence


def test_ivf_snapshot_roundtrip_identical_results(ivf_qp, tmp_path, small_config):
    """save/load must restore the trained index (centroids + layout) bit-identically:
    the same queries return the same ids/scores, with no retraining (VERDICT r1 #3)."""
    qp, vs, rows = ivf_qp
    queries = [dto(rows[i] + 0.01) for i in (0, 50, 150, 311)]
    before = [qp.find_similar(q, top_k=5, namespace="ns", metric="l2", nprobe=2) for q in queries]
    qp.save(str(tmp_path / "snap"))

    qp2 = QueryProcessor.load(str(tmp_path / "snap"), small_config)
    ns2 = qp2.storage.namespace("ns")
    assert ns2.ivf is not None
    after = [qp2.find_similar(q, top_k=5, namespace="ns", metric="l2", nprobe=2) for q in queries]
    for b_list, a_list in zip(before, after):
        assert [r["id"] for r in b_list] == [r["id"] for r in a_list]
        for b, a in zip(b_list, a_list):
            assert a["score"] == pytest.approx(b["score"], rel=1e-5, abs=1e-5)
    # layout (not just results) round-tripped
    ivf1 = qp.storage.namespace("ns").ivf
    assert ivf1._id_to_slot == ns2.ivf._id_to_slot
    np.testing.assert_allclose(
        np.asarray(ivf1.centroids), np.asarray(ns2.ivf.centroids), rtol=0, atol=0
    )


def test_snapshot_without_ivf_still_loads(ivf_qp, tmp_path, small_config):
    qp, vs, rows = ivf_qp
    qp.drop_ivf("ns")
    qp.save(str(tmp_path / "snap"))
    qp2 = QueryProcessor.load(str(tmp_path / "snap"), small_config)
    assert getattr(qp2.storage.namespace("ns"), "ivf", None) is None


# ------------------------------------------------------------------------- drift


def test_drift_triggers_retrain(small_config, rng):
    """Overwriting vectors into far-away clusters accumulates drift; once the ratio
    crosses rebuild_threshold the index retrains itself and recall recovers
    (VERDICT r1 weak #5: drift was previously unbounded)."""
    qp = QueryProcessor(config=small_config)
    rows, centers = clustered_data(rng, n_clusters=8, per=40, dim=16)
    vs = qp.upsert_many([dto(r, {"i": i}) for i, r in enumerate(rows)], "ns")
    qp.build_ivf("ns", n_clusters=8, n_iters=10, seed=0)
    ivf = qp.storage.namespace("ns").ivf
    assert ivf._drift == 0

    # move 30% of cluster-0's rows to cluster 7's region by overwriting in place
    moved = [(vs[i].id, rows[7 * 40 + (i % 40)] + 0.01) for i in range(0, 100)]
    qp.upsert_many([dto(v, {"moved": True}, vid) for vid, v in moved], "ns")

    # the retrain fired (drift reset) and the index reflects current geometry
    assert ivf._drift / max(1, ivf.live_count) < small_config.rebuild_threshold
    # recall check: moved vectors must be findable at nprobe=1 after retrain
    hits = qp.find_similar(dto(moved[3][1]), top_k=1, namespace="ns", metric="l2", nprobe=1)
    assert hits[0]["id"] == moved[3][0]


def test_drift_counts_deletes_and_stats_expose_ratio(ivf_qp):
    qp, vs, rows = ivf_qp
    ivf = qp.storage.namespace("ns").ivf
    qp.delete([vs[0].id, vs[1].id], "ns")
    s = ivf.stats()
    assert s["drift"] >= 2 or s["drift"] == 0  # 0 iff the delete crossed the retrain bar
    assert "drift_ratio" in s


# ------------------------------------------------------------------------- spill


def test_spill_improves_recall_at_fixed_nprobe(small_config, rng):
    """ScaNN-style multi-assignment: spill=2 must beat spill=1 recall at nprobe=1
    on boundary-heavy clustered data (each vector lives in its 2 nearest clusters)."""
    rows, centers = clustered_data(rng, n_clusters=8, per=40, dim=16, spread=0.8)
    queries = rows[rng.integers(0, len(rows), 24)] + 0.05 * rng.standard_normal((24, 16)).astype(np.float32)
    d = ((rows[None, :, :] - queries[:, None, :]) ** 2).sum(-1)
    true5 = [set(np.argsort(d[i])[:5].tolist()) for i in range(24)]

    recalls = {}
    for spill in (1, 2):
        qp = QueryProcessor(config=small_config)
        qp.upsert_many([dto(r, {"i": i}) for i, r in enumerate(rows)], "ns")
        ns = qp.storage.namespace("ns")
        qp.build_ivf("ns", n_clusters=8, n_iters=10, seed=0, spill=spill)
        hits = 0
        for i, q in enumerate(queries):
            got = qp.find_similar(dto(q), top_k=5, namespace="ns", metric="l2", nprobe=1)
            got_rows = {ns._id_to_slot[r["id"]] for r in got}
            hits += len(got_rows & true5[i])
        recalls[spill] = hits / (24 * 5)
    assert recalls[2] >= recalls[1], recalls
    assert recalls[2] > 0.8, recalls


def test_spill_no_duplicate_ids_and_k_respected(small_config, rng):
    rows, _ = clustered_data(rng, n_clusters=8, per=40, dim=16)
    qp = QueryProcessor(config=small_config)
    vs = qp.upsert_many([dto(r) for r in rows], "ns")
    stats = qp.build_ivf("ns", n_clusters=8, spill=2)
    assert stats["spill"] == 2 and stats["copies"] > stats["live"]
    for nprobe in (2, 8):
        got = qp.find_similar(dto(rows[7]), top_k=10, namespace="ns", metric="l2", nprobe=nprobe)
        ids = [r["id"] for r in got]
        assert len(ids) == len(set(ids)) == 10
    # full probe still matches exact search despite duplicate copies
    exact = qp.find_similar(dto(rows[7]), top_k=10, namespace="ns", metric="l2")
    approx = qp.find_similar(dto(rows[7]), top_k=10, namespace="ns", metric="l2", nprobe=8)
    assert [r["id"] for r in exact] == [r["id"] for r in approx]


def test_spill_tracks_mutations_and_snapshots(small_config, rng, tmp_path):
    rows, _ = clustered_data(rng, n_clusters=8, per=30, dim=16)
    qp = QueryProcessor(config=small_config)
    vs = qp.upsert_many([dto(r) for r in rows], "ns")
    qp.build_ivf("ns", n_clusters=8, spill=2)
    ivf = qp.storage.namespace("ns").ivf

    # incremental add places spill copies too
    nv = qp.insert(dto(rows[3] + 0.01), "ns")
    assert nv.id in ivf._id_to_slot
    # overwrite updates every copy (search for the NEW value finds it first)
    moved = rows[100] + 0.02
    qp.upsert_many([dto(moved, None, vs[5].id)], "ns")
    got = qp.find_similar(dto(moved), top_k=1, namespace="ns", metric="l2", nprobe=8)
    assert got[0]["id"] == vs[5].id and got[0]["score"] < 1e-3

    # delete clears every copy: the id never resurfaces
    qp.delete([vs[5].id], "ns")
    got = qp.find_similar(dto(moved), top_k=10, namespace="ns", metric="l2", nprobe=8)
    assert all(r["id"] != vs[5].id for r in got)
    assert vs[5].id not in ivf._extra_slots

    # snapshot round-trips the spilled layout identically
    qp.save(str(tmp_path / "snap"))
    qp2 = QueryProcessor.load(str(tmp_path / "snap"), small_config)
    ivf2 = qp2.storage.namespace("ns").ivf
    assert ivf2.spill == 2
    assert ivf2._id_to_slot == ivf._id_to_slot
    assert {k: sorted(v) for k, v in ivf2._extra_slots.items()} == {
        k: sorted(v) for k, v in ivf._extra_slots.items()
    }
    q = rows[20]
    a = qp.find_similar(dto(q), top_k=5, namespace="ns", metric="l2", nprobe=2)
    b = qp2.find_similar(dto(q), top_k=5, namespace="ns", metric="l2", nprobe=2)
    assert [r["id"] for r in a] == [r["id"] for r in b]


def test_ivf_rebuild_invalidates_result_cache(ivf_qp, rng):
    """(Re)building or dropping the index changes what nprobe searches return — the
    result cache must not serve the old index's results (found by the suite when a
    spill=2 rebuild returned the spill=1 curve verbatim)."""
    qp, vs, rows = ivf_qp
    q = dto(rows[11] + 0.01)
    first = qp.find_similar(q, top_k=3, namespace="ns", metric="l2", nprobe=1)
    ns = qp.storage.namespace("ns")
    v_before = ns.version
    qp.build_ivf("ns", n_clusters=8, n_iters=10, seed=3, spill=2)
    assert ns.version > v_before
    second = qp.find_similar(q, top_k=3, namespace="ns", metric="l2", nprobe=1)
    assert second  # recomputed against the new index, not a stale hit
    v_mid = ns.version
    qp.drop_ivf("ns")
    assert ns.version > v_mid
    exact = qp.find_similar(q, top_k=3, namespace="ns", metric="l2", nprobe=1)
    assert [r["id"] for r in exact] == [
        r["id"] for r in qp.find_similar(q, top_k=3, namespace="ns", metric="l2")
    ]
