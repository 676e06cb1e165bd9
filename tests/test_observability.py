"""Tracing spans, deep health, and their REST surface (SURVEY.md §5.1, §5.3 — subsystems
the reference lacks entirely)."""

import asyncio

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from mlvectordb_tpu import QueryProcessor, VectorDTO
from mlvectordb_tpu.api.rest_api import RestAPI
from mlvectordb_tpu.utils.health import check_store_invariants, deep_health, probe_device
from mlvectordb_tpu.utils.tracing import RECORDER, SpanRecorder, trace_span


def test_span_recorder_aggregates():
    rec = SpanRecorder(max_spans=4)
    rec.record("x", 0.0, 0.010, {})
    rec.record("x", 0.0, 0.030, {})
    rec.record("y", 0.0, 0.005, {"k": 1})
    s = rec.summary()
    assert s["x"]["count"] == 2
    assert s["x"]["avg_ms"] == pytest.approx(20.0)
    assert s["x"]["max_ms"] == pytest.approx(30.0)
    assert rec.recent()[-1]["name"] == "y"
    assert rec.recent()[-1]["k"] == 1


def test_engine_emits_spans(small_config, rng):
    RECORDER.clear()
    qp = QueryProcessor(config=small_config)
    qp.upsert_many(
        [VectorDTO(rng.standard_normal(8).astype(np.float32), {"i": i}) for i in range(20)],
        "ns",
    )
    qp.find_similar(VectorDTO(rng.standard_normal(8).astype(np.float32)), 3, "ns")
    qp.find_similar(
        VectorDTO(rng.standard_normal(8).astype(np.float32)), 3, "ns",
        filter={"i": {"$lt": 5}},
    )
    qp.delete([], "ns")
    s = RECORDER.summary()
    for name in ("upsert", "knn_kernel", "hydrate", "filter_mask", "delete"):
        assert name in s, f"missing span {name}; have {list(s)}"
    assert s["knn_kernel"]["count"] == 2


def test_probe_device_and_invariants(small_config, rng):
    p = probe_device()
    assert p["ok"] is True
    assert p["device_count"] >= 1

    qp = QueryProcessor(config=small_config)
    qp.upsert_many([VectorDTO(rng.standard_normal(4).astype(np.float32)) for _ in range(5)], "ns")
    inv = check_store_invariants(qp.storage)
    assert inv["ok"] is True

    report = deep_health(qp)
    assert report["status"] == "healthy"
    assert report["total_vectors"] == 5

    # corrupt an invariant -> degraded
    ns = qp.storage.namespace("ns")
    ns._slot_ids[0] = None
    inv = check_store_invariants(qp.storage)
    assert inv["ok"] is False


def test_rest_health_deep_and_trace(small_config):
    async def runner():
        qp = QueryProcessor(config=small_config)
        api = RestAPI(qp, enable_file_logging=False, log_level="WARNING")
        client = TestClient(TestServer(api.app))
        await client.start_server()
        try:
            resp = await client.get("/health")
            assert (await resp.json())["status"] == "healthy"

            resp = await client.get("/health?deep=1")
            assert resp.status == 200
            body = await resp.json()
            assert body["device"]["ok"] is True
            assert "native_filter_engine" in body

            await client.post(
                "/vectors?namespace=ns", json={"values": [1.0, 2.0]}
            )
            await client.post("/search?namespace=ns", json={"query": [1.0, 2.0]})
            resp = await client.get("/trace")
            body = await resp.json()
            assert "knn_kernel" in body["summary"]
            assert any(sp["name"] == "upsert" for sp in body["recent"])

            # profiler misuse -> 409, not 500
            resp = await client.post("/profile/stop")
            assert resp.status == 409
        finally:
            await client.close()

    asyncio.run(runner())
