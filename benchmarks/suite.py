"""Full benchmark matrix (BASELINE.md configs) on the local chip.

Run: python benchmarks/suite.py [--quick]
Prints one JSON object per config to stdout (one per line) + human lines to stderr.
bench.py remains the single-line headline the driver consumes; this suite fills in the
rest of the matrix (k=100, cosine hybrid, range, bf16 at DEEP-10M scale, upsert
throughput).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller sizes for smoke runs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks.timing import device_seconds_per_call
    from mlvectordb_tpu.ops.pallas_knn import exact_knn_pallas
    from mlvectordb_tpu.ops.topk import exact_knn

    on_tpu = jax.default_backend() == "tpu"
    backend = exact_knn_pallas if on_tpu else (
        lambda *a, **kw: exact_knn(*a, **{x: v for x, v in kw.items() if x != "live_prefix"})
    )
    rng = np.random.default_rng(42)
    results = []

    def emit(name, value, unit, **extra):
        rec = {"metric": name, "value": round(float(value), 2), "unit": unit, **extra}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    def mk(n, d, dtype=np.float32, as_bf16=False):
        db = rng.standard_normal((n, d), dtype=np.float32)
        dbj = jnp.asarray(db)
        if as_bf16:
            dbj = dbj.astype(jnp.bfloat16)
        sq = jnp.sum(jnp.asarray(db, jnp.float32) ** 2, axis=-1)
        return db, dbj, sq

    # ---------------- SIFT-1M shape: l2, k=100, batched (BASELINE config #2) --------
    N = 1 << (17 if args.quick else 20)
    D, B = 128, 128
    db_np, db, sq = mk(N, D)
    valid = jnp.ones((N,), jnp.bool_)
    q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
    for K in (10, 100):
        t = device_seconds_per_call(
            lambda qq, dd, vv, ss: backend(qq, dd, vv, ss, k=K, metric="l2", live_prefix=N),
            [q, db, valid, sq], iters=8,
        )
        log(f"SIFT-1M l2 k={K}: {t*1e3:.3f} ms/batch-{B} = {B/t:,.0f} QPS")
        emit(f"sift1m_l2_k{K}_qps", B / t, "qps", batch=B, n=N)

    # range query: top-limit + threshold (limit=1000 path)
    t = device_seconds_per_call(
        lambda qq, dd, vv, ss: backend(qq, dd, vv, ss, k=1000, metric="l2", live_prefix=N),
        [q[:8], db, valid, sq], iters=6,
    )
    log(f"SIFT-1M range(limit=1000): {t*1e3:.3f} ms/batch-8")
    emit("sift1m_range_limit1000_ms_batch8", t * 1e3, "ms", n=N)

    # ---------------- GloVe shape: cosine + metadata filter (config #3) -------------
    # 100-d lane-padded to 128; filter via masked kernel variant
    mask = np.ones(N, bool)
    mask[::2] = False  # 50% selectivity filter mask
    vmask = jnp.asarray(mask)
    t = device_seconds_per_call(
        lambda qq, dd, vv, ss: backend(qq, dd, vv, ss, k=10, metric="cosine", live_prefix=None),
        [q, db, vmask, sq], iters=8,
    )
    log(f"GloVe-shape cosine hybrid (50% filter): {t*1e3:.3f} ms/batch-{B} = {B/t:,.0f} QPS")
    emit("glove_cosine_hybrid_qps", B / t, "qps", batch=B, n=N, selectivity=0.5)

    # ---------------- DEEP-10M shape: bf16 (config #4, single-chip portion) ---------
    N2 = 1 << (18 if args.quick else 23)  # 8.4M rows x 128 lanes bf16 = 2 GB
    _, db2, sq2 = mk(N2, 128, as_bf16=True)
    valid2 = jnp.ones((N2,), jnp.bool_)
    t = device_seconds_per_call(
        lambda qq, dd, vv, ss: backend(qq, dd, vv, ss, k=10, metric="cosine", live_prefix=N2),
        [q, db2, valid2, sq2], iters=6,
    )
    log(f"DEEP-10M-shape bf16 ({N2} rows): {t*1e3:.3f} ms/batch-{B} = {B/t:,.0f} QPS")
    emit("deep8m_bf16_cosine_qps", B / t, "qps", batch=B, n=N2, dtype="bfloat16")
    del db2, sq2, valid2

    # ---------------- streaming upsert throughput (config #5 single-chip slice) -----
    from mlvectordb_tpu import QueryProcessor, VectorDTO
    from mlvectordb_tpu.config import EngineConfig

    qp = QueryProcessor(config=EngineConfig())
    batch = [
        VectorDTO(rng.standard_normal(128).astype(np.float32), {"i": i}) for i in range(1024)
    ]
    qp.upsert_many(batch, "bench")  # allocate + compile scatter
    t0 = time.perf_counter()
    iters = 5 if args.quick else 20
    for it in range(iters):
        qp.upsert_many(
            [VectorDTO(v.values, v.metadata, id=v.id) for v in batch], "bench"
        )
    dt = (time.perf_counter() - t0) / iters
    log(f"upsert: {1024/dt:,.0f} vectors/s (batch-1024 overwrite, incl. host bookkeeping)")
    emit("upsert_throughput", 1024 / dt, "vectors_per_s", batch=1024)

    log("\nALL RESULTS:")
    for r in results:
        log(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
