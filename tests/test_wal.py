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


def test_wal_covers_ivf_lifecycle(tmp_path, small_config, rng):
    """bulk_load -> build_ivf -> crash -> WAL-only recovery: nprobe search still runs
    the IVF path with pre-crash-equivalent layout (VERDICT r2 #6)."""
    wal_dir = str(tmp_path / "wal")
    qp = QueryProcessor(config=small_config)
    qp.enable_wal(wal_dir)
    vals = rng.standard_normal((300, 8)).astype(np.float32)
    qp.bulk_load(vals, "ns")
    stats = qp.build_ivf("ns", n_clusters=8, seed=5)
    pre = qp.find_similar(dto(vals[7]), top_k=5, namespace="ns", nprobe=8)
    # simulated crash: nothing saved except the WAL
    qp2 = QueryProcessor.load(str(tmp_path / "nonexistent"), small_config, wal_path=wal_dir)
    ns2 = qp2.storage.namespace("ns")
    assert ns2.ivf is not None, "recovered server silently lost its IVF index"
    assert ns2.ivf.C == stats["clusters"] and ns2.ivf.spill == stats["spill"]
    post = qp2.find_similar(dto(vals[7]), top_k=5, namespace="ns", nprobe=8)
    # seeded k-means over the same recovered rows: same answers, not just same shape
    assert [r["id"] for r in post] == [r["id"] for r in pre]

    # drop is logged too: recovery after a drop must NOT resurrect the index
    qp2.drop_ivf("ns")
    qp3 = QueryProcessor.load(str(tmp_path / "nonexistent"), small_config, wal_path=wal_dir)
    assert qp3.storage.namespace("ns").ivf is None


def test_wal_torn_middle_segment_stops_replay(tmp_path, rng):
    """Corruption in a NON-final segment must stop replay entirely — applying later
    segments over the gap would replay mutations out of order (ADVICE r2)."""
    wal = WriteAheadLog(str(tmp_path / "wal"))
    wal.append("upsert", "a", ids=[uuid.uuid4()],
               values=rng.standard_normal((1, 4)).astype(np.float32))
    sealed = wal.rotate()
    wal.append("upsert", "b", ids=[uuid.uuid4()],
               values=rng.standard_normal((1, 4)).astype(np.float32))
    wal.rotate()
    wal.append("upsert", "c", ids=[uuid.uuid4()],
               values=rng.standard_normal((1, 4)).astype(np.float32))
    wal.close()
    # corrupt the MIDDLE segment (segment 1)
    seg1 = sorted(
        f for f in os.listdir(str(tmp_path / "wal")) if f.startswith("wal_")
    )[1]
    p = str(tmp_path / "wal" / seg1)
    data = bytearray(open(p, "rb").read())
    data[20] ^= 0xFF
    open(p, "wb").write(bytes(data))

    recs = list(WriteAheadLog.replay(str(tmp_path / "wal")))
    # segment 0 applies; corrupt segment 1 stops everything, segment 2 NOT applied
    assert [r["ns"] for r in recs] == ["a"]


def test_wal_only_checkpoint_bounds_growth(tmp_path, small_config, rng):
    """WAL-only mode with checkpoint_bytes: the log gets pruned into a checkpoint
    snapshot, and recovery = checkpoint + remaining segments (ADVICE r2)."""
    wal_dir = str(tmp_path / "wal")
    qp = QueryProcessor(config=small_config)
    qp.enable_wal(wal_dir, checkpoint_bytes=20_000)
    all_vals = rng.standard_normal((400, 8)).astype(np.float32)
    ids = []
    for lo in range(0, 400, 50):
        ids.extend(qp.bulk_load(all_vals[lo : lo + 50], "ns"))
    wal_bytes = qp._wal.total_bytes()
    assert wal_bytes < 20_000 + 8_000, "log never pruned in WAL-only mode"
    assert os.path.isfile(os.path.join(wal_dir, "checkpoint", "manifest.json"))
    qp.delete([ids[0]], "ns")

    qp2 = QueryProcessor.load(str(tmp_path / "nope"), small_config, wal_path=wal_dir)
    assert qp2.get_namespace_count("ns") == 399
    got = qp2.find_similar(dto(all_vals[5]), top_k=1, namespace="ns", metric="l2")
    assert got[0]["id"] == ids[5] and got[0]["score"] == pytest.approx(0.0, abs=1e-6)


def test_checkpoint_old_fallback_recovers(tmp_path, small_config, rng):
    """Crash between the checkpoint swap's two renames leaves only checkpoint.old;
    recovery must fall back to it instead of silently starting empty (the covered
    WAL segments were already pruned — ADVICE r3 medium)."""
    import shutil

    wal_dir = str(tmp_path / "wal")
    qp = QueryProcessor(config=small_config)
    qp.enable_wal(wal_dir, checkpoint_bytes=20_000)
    all_vals = rng.standard_normal((400, 8)).astype(np.float32)
    ids = []
    for lo in range(0, 400, 50):
        ids.extend(qp.bulk_load(all_vals[lo : lo + 50], "ns"))
    ckpt = os.path.join(wal_dir, "checkpoint")
    assert os.path.isfile(os.path.join(ckpt, "manifest.json"))

    # simulate the torn swap: checkpoint/ renamed away, replacement never landed
    os.rename(ckpt, ckpt + ".old")
    qp2 = QueryProcessor.load(str(tmp_path / "nope"), small_config, wal_path=wal_dir)
    assert qp2.get_namespace_count("ns") == 400
    got = qp2.find_similar(dto(all_vals[7]), top_k=1, namespace="ns", metric="l2")
    assert got[0]["id"] == ids[7]

    # same fallback for an explicit snapshot directory torn mid-swap
    snap = str(tmp_path / "snap")
    qp.save(snap)
    shutil.move(snap, snap + ".old")
    qp3 = QueryProcessor.load(snap, small_config)
    assert qp3.get_namespace_count("ns") == 400
