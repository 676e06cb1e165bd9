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

    from benchmarks.timing import device_seconds_per_call as _dspc

    def device_seconds_per_call(fn, args, iters=8, runs=5):
        # MEDIAN of runs: a single differenced sample through the relay can under-
        # or over-measure by multiples (observed: a 0.24 ms reading for a program
        # whose HBM sweep alone takes 0.33); medians make every suite row a
        # defensible number at ~4x the timing cost (compiles still dominate)
        _dspc(fn, args, iters=2)  # warmup, discarded
        ts = sorted(_dspc(fn, args, iters=iters) for _ in range(runs))
        return ts[len(ts) // 2]
    import jax.tree_util as jtu

    from mlvectordb_tpu.ops.pallas_knn_t import (
        exact_knn_pallas_t,
        quantize_resid,
        search_prep,
        sweep_err_norms,
        to_sweep_layout,
    )
    from mlvectordb_tpu.ops.topk import exact_knn

    on_tpu = jax.default_backend() == "tpu"

    def backend(qq, dd, vv, ss, *, k, metric, live_prefix=None, ddt=None, derr=None,
                resid=None, rscale=None, err1=None, certify=True, prep=None):
        # the serving configuration: transposed sweep mirror + f32 rescan; ``derr``
        # (+ resid/rscale/err1, the int8 residual correction the engine's mixed
        # default maintains) feed the certificate's per-window bounds;
        # certify=False = margin-based mode (EngineConfig.certify_exact=False).
        # ``prep``: explicit search_prep dict so timed rows measure the
        # cached-prep program eager serving dispatches (the snapshot cache only
        # populates eagerly; without it the harness traces prep inline)
        if on_tpu and ddt is not None:
            return exact_knn_pallas_t(qq, ddt, dd, vv, ss, k=k, metric=metric,
                                      live_prefix=live_prefix, sweep_err=derr,
                                      resid=resid, rscale=rscale, err1=err1,
                                      certify=certify, prep=prep)
        return exact_knn(qq, dd, vv, ss, k=k, metric=metric, db_tile=4096)

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

    # ---------------- SIFT-1M: l2, k in {10, 100, 1000}, batched (config #2) --------
    # real SIFT-1M when a local copy exists; faithful clustered synthesis otherwise
    from benchmarks.datasets import load_sift1m

    N = 1 << (17 if args.quick else 20)
    D, B = 128, 128
    ds = load_sift1m(limit=N, n_queries=B)
    sift = np.zeros((N, 128), np.float32)
    sift[: len(ds["data"]), : ds["data"].shape[1]] = ds["data"][:N]
    db_np = sift
    db = jnp.asarray(db_np)
    db_t = to_sweep_layout(db, dtype=jnp.bfloat16)
    # the engine's mixed-config default: int8 residual correction + error norms
    # (NB: these ride as harness ARGS below, never closures — closure capture bakes
    # them into the HLO and the relay's remote-compile endpoint rejects the payload)
    db_resid, db_rscale, db_err, db_err1 = quantize_resid(db)
    sq = jnp.sum(db * db, axis=-1)
    valid = jnp.ones((N,), jnp.bool_)
    qs_np = np.zeros((B, 128), np.float32)
    qs_np[:, : ds["queries"].shape[1]] = ds["queries"][:B]
    q = jnp.asarray(qs_np)
    cert_args = [db_t, db, valid, sq, db_err, db_resid, db_rscale, db_err1]

    def mk_prep(k, metric="l2", certify=True):
        if not on_tpu:
            return [], None
        p = search_prep(B, db_t, db.dtype, valid, sq, k=k, metric=metric,
                        live_prefix=N, certify=certify, sweep_err=db_err,
                        resid=db_resid, rscale=db_rscale, err1=db_err1)
        return jtu.tree_flatten(p)

    def cert_backend(qq, ddt, dd, vv, ss, de, rz, rs, e1, *pl, k, metric="l2",
                     pdef=None):
        prep = jtu.tree_unflatten(pdef, pl) if pdef is not None else None
        return backend(qq, dd, vv, ss, k=k, metric=metric, live_prefix=N, ddt=ddt,
                       derr=de, resid=rz, rscale=rs, err1=e1, prep=prep)

    # recall gate on the suite's own data before any timing
    d_or = (
        (db_np ** 2).sum(-1)[None, :]
        - 2.0 * (qs_np @ db_np.T)
        + (qs_np ** 2).sum(-1)[:, None]
    )
    i_or10 = np.argpartition(d_or, 10, axis=1)[:, :10]
    _, i_eng = cert_backend(q, *cert_args, k=10)
    i_eng = np.asarray(i_eng)
    recall = np.mean([
        len(set(i_eng[b].tolist()) & set(i_or10[b].tolist())) / 10 for b in range(B)
    ])
    log(f"{ds['name']} recall@10 gate: {recall}")
    assert recall == 1.0, f"exactness violated on {ds['name']}: recall={recall}"
    emit("sift1m_recall_at_10", recall, "recall", dataset=ds["name"], kind=ds["kind"])

    # k=1000 is the REST contract's top_k cap (reference rest_api.py:24)
    for K in (10, 100, 1000):
        kleaves, kdef = mk_prep(K)
        t = device_seconds_per_call(
            lambda qq, ddt, dd, vv, ss, de, rz, rs, e1, *pl, _k=K, _pd=kdef:
                cert_backend(qq, ddt, dd, vv, ss, de, rz, rs, e1, *pl, k=_k,
                             pdef=_pd),
            [q] + cert_args + kleaves, iters=8,
        )
        log(f"{ds['name']} l2 k={K}: {t*1e3:.3f} ms/batch-{B} = {B/t:,.0f} QPS")
        emit(f"sift1m_l2_k{K}_qps", B / t, "qps", batch=B, n=N, dataset=ds["name"])

    # margin-based mode (certify_exact=False): the round-2 contract — exactness via
    # the empirical margin, gated here on recall (clustered corpora escalate the
    # certificate by design, so serving may opt into this trade)
    _, i_nc = backend(q, db, valid, sq, k=10, metric="l2", live_prefix=N, ddt=db_t,
                      derr=db_err, certify=False)
    i_nc = np.asarray(i_nc)
    recall_nc = np.mean([
        len(set(i_nc[b].tolist()) & set(i_or10[b].tolist())) / 10 for b in range(B)
    ])
    log(f"{ds['name']} margin-mode recall@10 gate: {recall_nc}")
    emit("sift1m_margin_mode_recall_at_10", recall_nc, "recall", dataset=ds["name"])
    assert recall_nc == 1.0, f"margin-mode recall broke on {ds['name']}: {recall_nc}"
    for K in (10, 100):
        mleaves, mdef = mk_prep(K, certify=False)
        t = device_seconds_per_call(
            lambda qq, ddt, dd, vv, ss, *pl, _k=K, _pd=mdef: backend(
                qq, dd, vv, ss, k=_k, metric="l2", live_prefix=N, ddt=ddt,
                derr=db_err, certify=False,
                prep=jtu.tree_unflatten(_pd, pl) if _pd is not None else None,
            ),
            [q, db_t, db, valid, sq] + mleaves, iters=8,
        )
        log(f"{ds['name']} l2 k={K} margin-mode: {t*1e3:.3f} ms = {B/t:,.0f} QPS")
        emit(f"sift1m_l2_k{K}_margin_mode_qps", B / t, "qps", batch=B, n=N)

    # range query: top-limit + threshold (limit=1000 path)
    t = device_seconds_per_call(
        lambda qq, ddt, dd, vv, ss, de, rz, rs, e1: cert_backend(
            qq, ddt, dd, vv, ss, de, rz, rs, e1, k=1000),
        [q[:8]] + cert_args, iters=6,
    )
    log(f"{ds['name']} range(limit=1000): {t*1e3:.3f} ms/batch-8")
    emit("sift1m_range_limit1000_ms_batch8", t * 1e3, "ms", n=N)

    # ---------------- IVF recall@10 vs nprobe curve (the approximate-knob gate) -----
    # measured on the clustered corpus — recall at small nprobe is only meaningful on
    # realistically clustered data (VERDICT r1 #5/#9)
    from mlvectordb_tpu import QueryProcessor, VectorDTO
    from mlvectordb_tpu.config import EngineConfig

    ivf_n = min(N, 1 << 17)
    qp_ivf = QueryProcessor(config=EngineConfig())
    qp_ivf.bulk_load(db_np[:ivf_n], "ivf")
    qp_ivf.build_ivf("ivf", n_clusters=min(1024, ivf_n // 64))
    d_or_ivf = (
        (db_np[:ivf_n] ** 2).sum(-1)[None, :]
        - 2.0 * (qs_np[:32] @ db_np[:ivf_n].T)
        + (qs_np[:32] ** 2).sum(-1)[:, None]
    )
    true10 = [set(np.argpartition(d_or_ivf[i], 10)[:10].tolist()) for i in range(32)]
    curve = {}
    for nprobe in (1, 2, 4, 8, 16):
        got = qp_ivf.find_similar_batch(
            [VectorDTO(row) for row in qs_np[:32]], 10, "ivf", "l2", nprobe=nprobe
        )
        hits = 0
        ns_ivf = qp_ivf.storage.namespace("ivf")
        for i, rs in enumerate(got):
            got_idx = {ns_ivf._id_to_slot[r["id"]] for r in rs}
            hits += len(got_idx & true10[i])
        curve[nprobe] = hits / (32 * 10)
        log(f"IVF recall@10 nprobe={nprobe}: {curve[nprobe]:.3f}")
    emit("ivf_recall_at_10_vs_nprobe", curve[4], "recall",
         curve={str(k2): round(v, 4) for k2, v in curve.items()},
         dataset=ds["name"], n=ivf_n)
    # the gate: on clustered data modest probing must recover most true neighbours
    assert curve[16] >= 0.9, f"IVF recall collapsed on clustered data: {curve}"
    # spilled variant: each vector in its 2 nearest clusters (recall at fixed nprobe)
    qp_ivf.build_ivf("ivf", n_clusters=min(1024, ivf_n // 64), spill=2)
    ns_ivf2 = qp_ivf.storage.namespace("ivf")
    curve2 = {}
    for nprobe in (1, 2, 4, 8, 16):
        got = qp_ivf.find_similar_batch(
            [VectorDTO(row) for row in qs_np[:32]], 10, "ivf", "l2", nprobe=nprobe
        )
        hits = sum(
            len({ns_ivf2._id_to_slot[r["id"]] for r in rs} & true10[i])
            for i, rs in enumerate(got)
        )
        curve2[nprobe] = hits / (32 * 10)
        log(f"IVF spill=2 recall@10 nprobe={nprobe}: {curve2[nprobe]:.3f}")
    emit("ivf_spill2_recall_at_10_vs_nprobe", curve2[4], "recall",
         curve={str(k2): round(v, 4) for k2, v in curve2.items()},
         dataset=ds["name"], n=ivf_n)
    del qp_ivf

    # ---------------- GloVe shape: cosine + metadata filter (config #3) -------------
    # 100-d lane-padded to 128; filter via masked kernel variant
    mask = np.ones(N, bool)
    mask[::2] = False  # 50% selectivity filter mask
    vmask = jnp.asarray(mask)
    # recall gate for the MASKED path too: filtered oracle over the surviving rows
    _, i_hy = backend(q[:16], db, vmask, sq, k=10, metric="cosine", live_prefix=None,
                        ddt=db_t, derr=db_err, resid=db_resid, rscale=db_rscale,
                        err1=db_err1)
    i_hy = np.asarray(i_hy)
    qs16 = qs_np[:16]
    dots = qs16 @ db_np.T
    cos = dots / np.maximum(
        np.linalg.norm(qs16, axis=1)[:, None] * np.linalg.norm(db_np, axis=1)[None, :], 1e-30
    )
    cos[:, ~mask] = -np.inf
    i_hyor = np.argpartition(-cos, 10, axis=1)[:, :10]
    hy_recall = np.mean([
        len(set(i_hy[b].tolist()) & set(i_hyor[b].tolist())) / 10 for b in range(16)
    ])
    log(f"hybrid (masked) recall@10 gate: {hy_recall}")
    assert hy_recall == 1.0, f"masked-path exactness violated: {hy_recall}"
    assert bool(mask[np.asarray(i_hy).ravel()].all()), "filtered-out row leaked into results"
    # masked prep threaded explicitly: the engine caches it per (filter, version)
    # (FilterMaskCache.prep_cache_for), so the serving-representative row is the
    # cached-prep program, not the inline-prep one
    if on_tpu:
        ph = search_prep(B, db_t, db.dtype, vmask, sq, k=10, metric="cosine",
                         live_prefix=None, sweep_err=db_err, resid=db_resid,
                         rscale=db_rscale, err1=db_err1)
        ph_leaves, ph_def = jtu.tree_flatten(ph)
    else:
        ph_leaves, ph_def = [], None
    t = device_seconds_per_call(
        lambda qq, ddt, dd, vv, ss, de, rz, rs, e1, *pl: backend(
            qq, dd, vv, ss, k=10, metric="cosine", live_prefix=None, ddt=ddt,
            derr=de, resid=rz, rscale=rs, err1=e1,
            prep=jtu.tree_unflatten(ph_def, pl) if ph_def is not None else None),
        [q, db_t, db, vmask, sq, db_err, db_resid, db_rscale, db_err1] + ph_leaves,
        iters=8,
    )
    log(f"GloVe-shape cosine hybrid (50% filter, heavy cert): {t*1e3:.3f} ms/batch-{B} = {B/t:,.0f} QPS")
    emit("glove_cosine_hybrid_qps", B / t, "qps", batch=B, n=N, selectivity=0.5)
    # SERVING-REPRESENTATIVE certified row: the engine's adaptive dispatch serves
    # the LIGHT single-pass certified program on every namespace until a tier-2
    # flip (engine/query_processor._use_light), so the heavy row above is what a
    # clustered corpus converges to, not what this corpus serves.  Verify light
    # actually certifies here (tier 0), then time it.
    if on_tpu:
        from mlvectordb_tpu.ops.pallas_knn_t import exact_knn_pallas_t as _ekt

        phl = search_prep(B, db_t, db.dtype, vmask, sq, k=10, metric="cosine",
                          live_prefix=None, light=True, sweep_err=db_err,
                          resid=db_resid, rscale=db_rscale, err1=db_err1)
        phl_leaves, phl_def = jtu.tree_flatten(phl)
        _, _, t_hyl = _ekt(q, db_t, db, vmask, sq, k=10, metric="cosine",
                           live_prefix=None, sweep_err=db_err, resid=db_resid,
                           rscale=db_rscale, err1=db_err1, light=True,
                           report_tier=True, prep=phl)
        log(f"hybrid light certificate tier: {int(t_hyl)}")
        t = device_seconds_per_call(
            lambda qq, ddt, dd, vv, ss, de, rz, rs, e1, *pl: _ekt(
                qq, ddt, dd, vv, ss, k=10, metric="cosine", live_prefix=None,
                sweep_err=de, resid=rz, rscale=rs, err1=e1, light=True,
                prep=jtu.tree_unflatten(phl_def, pl)),
            [q, db_t, db, vmask, sq, db_err, db_resid, db_rscale, db_err1] + phl_leaves,
            iters=8,
        )
        log(f"GloVe-shape cosine hybrid (50% filter, LIGHT cert — serving default): "
            f"{t*1e3:.3f} ms/batch-{B} = {B/t:,.0f} QPS")
        emit("glove_cosine_hybrid_light_qps", B / t, "qps", batch=B, n=N,
             selectivity=0.5, tier=int(t_hyl))
    t = device_seconds_per_call(
        lambda qq, ddt, dd, vv, ss: backend(qq, dd, vv, ss, k=10, metric="cosine",
                                            live_prefix=None, ddt=ddt, derr=db_err,
                                            certify=False),
        [q, db_t, db, vmask, sq], iters=8,
    )
    log(f"GloVe hybrid margin-mode: {t*1e3:.3f} ms/batch-{B} = {B/t:,.0f} QPS")
    emit("glove_cosine_hybrid_margin_mode_qps", B / t, "qps", batch=B, n=N, selectivity=0.5)

    # ---------------- worst-case corpus floor (VERDICT r4 weak #6) ------------------
    # within_scale=0.18 (5x tighter than the suite corpus): the residual band sits
    # above the neighbour-gap scale, so the certificate correctly refuses tier-1 at
    # every k and every batch runs the exact-scan tier.  This row publishes the QPS
    # FLOOR an operator can size against for adversarial data; exactness holds
    # throughout (escalation costs speed, never correctness).
    from benchmarks.datasets import synthesize_clustered

    wc_n = 1 << (16 if args.quick else 20)
    wc = synthesize_clustered(wc_n, 128, B, n_clusters=2000, within_scale=0.18,
                              anisotropy=6.0)
    wdb = jnp.asarray(wc["data"])
    wsq = jnp.sum(wdb.astype(jnp.float32) * wdb.astype(jnp.float32), axis=-1)
    wq = jnp.asarray(wc["queries"][:B])
    wvalid = jnp.ones((wc_n,), jnp.bool_)
    wdb_t = to_sweep_layout(wdb, dtype=jnp.bfloat16) if on_tpu else None
    if on_tpu:
        wresid, wrscale, werr2, werr1 = quantize_resid(wdb)
        for K in (10, 100, 1000):
            pw = search_prep(B, wdb_t, wdb.dtype, wvalid, wsq, k=K, metric="l2",
                             live_prefix=wc_n, sweep_err=werr2, resid=wresid,
                             rscale=wrscale, err1=werr1)
            pw_leaves, pw_def = jtu.tree_flatten(pw)
            from mlvectordb_tpu.ops.pallas_knn_t import exact_knn_pallas_t as _ekt2

            def _wc_fn(qq, ddt, dd, vv, ss, se, rz, rs, e1, *pl, _K=K, _pd=pw_def):
                return _ekt2(qq, ddt, dd, vv, ss, k=_K, metric="l2",
                             live_prefix=wc_n, sweep_err=se, resid=rz, rscale=rs,
                             err1=e1, report_tier=True,
                             prep=jtu.tree_unflatten(_pd, pl))

            wargs = [wq, wdb_t, wdb, wvalid, wsq, werr2, wresid, wrscale, werr1] + pw_leaves
            _, _, wtier = _wc_fn(*wargs)
            t = device_seconds_per_call(_wc_fn, wargs, iters=6)
            log(f"worst-case (within_scale=0.18) k={K}: {t*1e3:.3f} ms/batch-{B} = "
                f"{B/t:,.0f} QPS  tier={int(wtier)}")
            emit(f"worstcase_ws018_l2_k{K}_qps", B / t, "qps", batch=B, n=wc_n,
                 tier=int(wtier))
        del wresid, wrscale, werr2, werr1
    del wdb, wsq, wq, wvalid, wdb_t, wc

    # ---------------- DEEP-10M shape: bf16 (config #4, single-chip portion) ---------
    N2 = 1 << (18 if args.quick else 23)  # 8.4M rows x 128 lanes bf16 = 2 GB
    _, db2, sq2 = mk(N2, 128, as_bf16=True)
    db2_t = to_sweep_layout(db2)
    valid2 = jnp.ones((N2,), jnp.bool_)
    if on_tpu:
        p2 = search_prep(B, db2_t, db2.dtype, valid2, sq2, k=10, metric="cosine",
                         live_prefix=N2)
        p2_leaves, p2_def = jtu.tree_flatten(p2)
    else:
        p2_leaves, p2_def = [], None
    t = device_seconds_per_call(
        lambda qq, ddt, dd, vv, ss, *pl: backend(
            qq, dd, vv, ss, k=10, metric="cosine", live_prefix=N2, ddt=ddt,
            prep=jtu.tree_unflatten(p2_def, pl) if p2_def is not None else None),
        [q, db2_t, db2, valid2, sq2] + p2_leaves, iters=6,
    )
    log(f"DEEP-10M-shape bf16 ({N2} rows): {t*1e3:.3f} ms/batch-{B} = {B/t:,.0f} QPS")
    emit("deep8m_bf16_cosine_qps", B / t, "qps", batch=B, n=N2, dtype="bfloat16")
    del db2, sq2, valid2, db2_t

    # ---------------- streaming upsert throughput (config #5 single-chip slice) -----
    from mlvectordb_tpu import QueryProcessor, VectorDTO
    from mlvectordb_tpu.config import EngineConfig

    qp = QueryProcessor(config=EngineConfig())
    batch = [
        VectorDTO(rng.standard_normal(128).astype(np.float32), {"i": i}) for i in range(1024)
    ]
    qp.upsert_many(batch, "bench")  # allocate + compile scatter
    ns_b = qp.storage.namespace("bench")
    # FENCE: without a device readback here the previous row's queued async work
    # (the DEEP sweep) bleeds into iteration 1 and the row can read 10-20x slow
    np.asarray(jax.device_get(ns_b.device_state().sq_norms[:1]))
    t0 = time.perf_counter()
    iters = 5 if args.quick else 20
    for it in range(iters):
        qp.upsert_many(
            [VectorDTO(v.values, v.metadata, id=v.id) for v in batch], "bench"
        )
    np.asarray(jax.device_get(ns_b.device_state().sq_norms[:1]))  # drain the queue
    dt = (time.perf_counter() - t0) / iters
    log(f"upsert: {1024/dt:,.0f} vectors/s (batch-1024 overwrite; relay-RTT bound: "
        f"~2-3 round trips/batch through the axon tunnel)")
    emit("upsert_throughput", 1024 / dt, "vectors_per_s", batch=1024)

    log("\nALL RESULTS:")
    for r in results:
        log(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
