"""Measure the serving warmup bill (VERDICT r3 #5: <= 90 s, zero unwarmed stalls).

Builds the recommended serving config on a 1M x 128 corpus, runs
QueryProcessor.warmup(detail=True), and prints wall seconds + the per-program
compile bill, then verifies a cold->warm search dispatches with no compile stall.

Run on TPU: python benchmarks/probe_warmup.py [N_log2=20]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)


def main():
    import jax

    from mlvectordb_tpu.config import EngineConfig
    from mlvectordb_tpu.engine.query_processor import QueryProcessor
    from mlvectordb_tpu.interfaces.vector import VectorDTO

    print(f"backend={jax.default_backend()} N={N}", flush=True)
    rng = np.random.default_rng(42)
    db = rng.standard_normal((N, 128), dtype=np.float32)

    config = EngineConfig(
        sweep_dtype="bfloat16" if jax.default_backend() == "tpu" else None,
        query_buckets=(8, 128, 512),
        k_buckets=(16, 128, 1024),
    )
    qp = QueryProcessor(config=config)
    t0 = time.perf_counter()
    qp.bulk_load(db, "serve")
    print(f"bulk_load: {time.perf_counter()-t0:.1f} s", flush=True)

    t0 = time.perf_counter()
    count, report = qp.warmup("serve", detail=True)
    wall = time.perf_counter() - t0
    print(f"warmup: {count} programs in {wall:.1f} s wall", flush=True)
    for key, secs in sorted(report.items(), key=lambda kv: -kv[1]):
        print(f"  {key}: {secs:.1f} s", flush=True)

    # zero unwarmed-bucket stalls: a fresh serving-shaped search must complete in
    # milliseconds, not a compile
    for b, k in ((128, 10), (8, 10), (128, 100), (512, 10)):
        qs = [VectorDTO(row) for row in rng.standard_normal((b, 128), dtype=np.float32)]
        t0 = time.perf_counter()
        qp.find_similar_batch(qs, k, "serve", "l2")
        dt = time.perf_counter() - t0
        stall = "STALL" if dt > 2.0 else "ok"
        print(f"post-warm search b={b} k={k}: {dt*1e3:.0f} ms  {stall}", flush=True)
    print(f"RESULT warmup_wall_s={wall:.1f} target=90", flush=True)


if __name__ == "__main__":
    main()
