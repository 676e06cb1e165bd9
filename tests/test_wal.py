"""Write-ahead log: crash durability between snapshots (engine/wal.py).

The reference has nothing here (SURVEY.md §5.4); the WAL closes the gap left by
coarse snapshots: log-then-apply, idempotent replay, torn-tail tolerance.
"""

import os
import uuid

import numpy as np
import pytest

from mlvectordb_tpu import QueryProcessor, VectorDTO
from mlvectordb_tpu.engine.wal import WriteAheadLog


def dto(vals, meta=None, vid=None):
    return VectorDTO(values=vals, metadata=meta, id=vid)


def test_wal_append_replay_roundtrip(tmp_path, rng):
    wal = WriteAheadLog(str(tmp_path / "wal"))
    ids = [uuid.uuid4() for _ in range(3)]
    vals = rng.standard_normal((3, 8)).astype(np.float32)
    wal.append("upsert", "ns", ids=ids, values=vals, metadatas=[{"i": i} for i in range(3)])
    wal.append("delete", "ns", ids=[ids[0]])
    wal.append("delete_namespace", "other")
    wal.close()

    recs = list(WriteAheadLog.replay(str(tmp_path / "wal")))
    assert [r["op"] for r in recs] == ["upsert", "delete", "delete_namespace"]
    np.testing.assert_array_equal(recs[0]["values"], vals)
    assert recs[0]["ids"] == [str(i) for i in ids]
    assert recs[0]["meta"] == [{"i": 0}, {"i": 1}, {"i": 2}]
    assert recs[2]["ns"] == "other"


def test_wal_torn_tail_dropped(tmp_path, rng):
    wal = WriteAheadLog(str(tmp_path / "wal"))
    wal.append("upsert", "ns", ids=[uuid.uuid4()], values=rng.standard_normal((1, 4)).astype(np.float32))
    wal.append("delete", "ns", ids=[uuid.uuid4()])
    wal.close()
    # simulate a crash mid-append: truncate the last record
    seg = sorted(os.listdir(tmp_path / "wal"))[0]
    full = tmp_path / "wal" / seg
    data = full.read_bytes()
    full.write_bytes(data[:-7])
    recs = list(WriteAheadLog.replay(str(tmp_path / "wal")))
    assert len(recs) == 1 and recs[0]["op"] == "upsert"
    # corrupt a byte inside the first record's payload: CRC must reject it
    bad = bytearray(data[: len(data) // 2 * 2])
    bad[30] ^= 0xFF
    full.write_bytes(bytes(bad))
    assert list(WriteAheadLog.replay(str(tmp_path / "wal"))) == []


def test_crash_recovery_without_snapshot(tmp_path, small_config, rng):
    """Everything written before a 'crash' (no snapshot ever taken) is recovered."""
    wal_dir = str(tmp_path / "wal")
    qp = QueryProcessor(config=small_config)
    qp.enable_wal(wal_dir)
    vs = qp.upsert_many([dto(rng.standard_normal(8).astype(np.float32), {"i": i}) for i in range(30)], "ns")
    one = qp.insert(dto(rng.standard_normal(8).astype(np.float32), {"solo": True}), "ns")
    qp.delete([vs[0].id, vs[1].id], "ns")
    qp.bulk_load(rng.standard_normal((50, 8)).astype(np.float32), "bulk")
    qp.delete_namespace("bulk")
    # crash: no save(); recover from WAL alone
    qp2 = QueryProcessor.load(str(tmp_path / "nonexistent"), small_config, wal_path=wal_dir)
    assert qp2.get_namespace_count("ns") == 29
    assert qp2.storage.read(vs[0].id, "ns") is None
    got = qp2.storage.read(one.id, "ns")
    assert got is not None and got.metadata == {"solo": True}
    np.testing.assert_array_equal(got.values, one.values)
    assert "bulk" not in qp2.list_namespaces()


def test_snapshot_plus_wal_recovery(tmp_path, small_config, rng):
    """save() seals+prunes covered segments; only post-snapshot writes replay."""
    wal_dir = str(tmp_path / "wal")
    snap = str(tmp_path / "snap")
    qp = QueryProcessor(config=small_config)
    qp.enable_wal(wal_dir)
    pre = qp.upsert_many([dto(rng.standard_normal(8).astype(np.float32)) for _ in range(20)], "ns")
    qp.save(snap)
    segs_after_save = sorted(os.listdir(wal_dir))
    post = qp.upsert_many([dto(rng.standard_normal(8).astype(np.float32), {"post": True}) for _ in range(5)], "ns")
    qp.delete([pre[3].id], "ns")

    qp2 = QueryProcessor.load(snap, small_config, wal_path=wal_dir)
    assert qp2.get_namespace_count("ns") == 24  # 20 - 1 + 5
    assert qp2.storage.read(pre[3].id, "ns") is None
    assert qp2.storage.read(post[0].id, "ns").metadata == {"post": True}
    # the pre-snapshot segment was pruned (covered by the snapshot)
    assert all(int(s.split("_")[1].split(".")[0]) >= 1 for s in segs_after_save)


def test_replay_is_idempotent(tmp_path, small_config, rng):
    wal_dir = str(tmp_path / "wal")
    qp = QueryProcessor(config=small_config)
    qp.enable_wal(wal_dir)
    vs = qp.upsert_many([dto(rng.standard_normal(8).astype(np.float32)) for _ in range(10)], "ns")
    qp.delete([vs[9].id], "ns")

    qp2 = QueryProcessor(config=small_config)
    assert qp2.replay_wal(wal_dir) == 2
    assert qp2.replay_wal(wal_dir) == 2  # replaying twice changes nothing
    assert qp2.get_namespace_count("ns") == 9
    ids2 = {v.id for v in qp2.get_namespace_vectors("ns")}
    assert ids2 == {v.id for v in vs[:9]}


def test_wal_search_results_survive_recovery(tmp_path, small_config, rng, oracle):
    wal_dir = str(tmp_path / "wal")
    qp = QueryProcessor(config=small_config)
    qp.enable_wal(wal_dir)
    vs = qp.upsert_many([dto(rng.standard_normal(8).astype(np.float32)) for _ in range(40)], "ns")
    q = rng.standard_normal(8).astype(np.float32)
    before = qp.find_similar(dto(q), top_k=5, namespace="ns", metric="l2")

    qp2 = QueryProcessor.load(str(tmp_path / "none"), small_config, wal_path=wal_dir)
    after = qp2.find_similar(dto(q), top_k=5, namespace="ns", metric="l2")
    assert [r["id"] for r in before] == [r["id"] for r in after]
    for b, a in zip(before, after):
        assert a["score"] == pytest.approx(b["score"], rel=1e-6)


def test_prune_deferred_until_snapshot_is_final(tmp_path, small_config, rng):
    """_save_snapshot must NOT prune: a crash between writing a temp snapshot and its
    atomic rename would otherwise lose every record since the previous snapshot."""
    wal_dir = str(tmp_path / "wal")
    qp = QueryProcessor(config=small_config)
    qp.enable_wal(wal_dir)
    vs = qp.upsert_many([dto(rng.standard_normal(8).astype(np.float32)) for _ in range(8)], "ns")

    sealed = qp._save_snapshot(str(tmp_path / "snap.tmp"))
    assert sealed and all(os.path.exists(s) for s in sealed)  # still replayable
    # crash HERE (before the rename): recovery from the OLD state + WAL sees everything
    qp2 = QueryProcessor.load(str(tmp_path / "missing"), small_config, wal_path=wal_dir)
    assert qp2.get_namespace_count("ns") == 8

    qp._wal.prune(sealed)  # what the caller does after the rename
    assert not any(os.path.exists(s) for s in sealed)
