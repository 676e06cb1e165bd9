"""Benchmark dataset loaders: format readers + the synthetic fallback's statistics."""

import os

import numpy as np

from benchmarks.datasets import (
    load_glove,
    load_sift1m,
    read_fvecs,
    read_ivecs,
    synthesize_clustered,
)


def test_fvecs_ivecs_roundtrip(tmp_path):
    rows = np.random.default_rng(0).standard_normal((5, 7)).astype(np.float32)
    buf = b""
    for r in rows:
        buf += np.int32(7).tobytes() + r.tobytes()
    p = tmp_path / "x.fvecs"
    p.write_bytes(buf)
    got = read_fvecs(str(p))
    np.testing.assert_array_equal(got, rows)
    np.testing.assert_array_equal(read_fvecs(str(p), limit=2), rows[:2])

    ints = np.arange(12, dtype=np.int32).reshape(3, 4)
    buf = b""
    for r in ints:
        buf += np.int32(4).tobytes() + r.tobytes()
    p = tmp_path / "x.ivecs"
    p.write_bytes(buf)
    np.testing.assert_array_equal(read_ivecs(str(p)), ints.astype(np.int64))


def test_synthesize_clustered_statistics():
    out = synthesize_clustered(5000, 32, 100, n_clusters=50, within_scale=0.3)
    data, queries = out["data"], out["queries"]
    assert data.shape == (5000, 32) and queries.shape == (100, 32)
    assert data.dtype == np.float32
    # clustered: mean nearest-neighbor distance far below the random-pair distance
    sub = data[:800]
    d = ((sub[:, None, :] - sub[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    nn = np.sqrt(d.min(1)).mean()
    rand = np.sqrt(d[np.isfinite(d)]).mean()
    assert nn < 0.35 * rand, (nn, rand)
    # queries sit near the corpus manifold (the realistic serving regime)
    qd = ((queries[:, None, :] - sub[None, :, :]) ** 2).sum(-1).min(1)
    assert np.sqrt(qd).mean() < rand * 0.5


def test_synthesize_normalized():
    out = synthesize_clustered(1000, 16, 10, n_clusters=20, within_scale=0.3, normalize=True)
    norms = np.linalg.norm(out["data"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_loaders_fall_back_to_synthetic(monkeypatch, tmp_path):
    # force the no-local-data, no-network path
    monkeypatch.setenv("MLVDB_DATASETS", str(tmp_path))
    monkeypatch.setattr("benchmarks.datasets._try_fetch", lambda *a, **k: False)
    ds = load_sift1m(limit=2048, n_queries=16)
    assert ds["kind"] == "synthetic" and ds["data"].shape == (2048, 128)
    assert ds["metric"] == "l2"
    ds = load_glove(limit=1024, n_queries=8)
    assert ds["kind"] == "synthetic" and ds["data"].shape == (1024, 100)
    assert ds["metric"] == "cosine"
    np.testing.assert_allclose(np.linalg.norm(ds["data"], axis=1), 1.0, atol=1e-5)
