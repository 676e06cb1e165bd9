"""Round-3 lab: attribute phase-2 selection cost at large N and large k.

Not part of the test suite — a notebook for the round-3 selection rework
(VERDICT r2 #1: DEEP-10M-shape >= 35K QPS, k=1000 >= 15K QPS).

Run: python benchmarks/explore_select.py --n 20 --k 1000
     python benchmarks/explore_select.py --n 23 --k 10 --dtype bf16
Env: SELECT_ONLY=full,micro,... to filter probe groups.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20, help="log2 database rows")
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--dtype", choices=("f32", "bf16"), default="bf16")
    ap.add_argument(
        "--rescan-dtype", choices=("f32", "bf16"), default="f32",
        help="store/rescan matrix dtype (bf16 = the suite's DEEP-10M config; also "
        "halves device memory so 2^23 rows fit alongside the sweep mirror)",
    )
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks.timing import device_seconds_per_call
    from mlvectordb_tpu.ops import pallas_knn_t as pkt


    N, D, B, K = 1 << args.n, 128, args.b, args.k
    rng = np.random.default_rng(42)
    db_np = rng.standard_normal((N, D), dtype=np.float32)
    q_np = rng.standard_normal((B, D), dtype=np.float32)

    store_dt = jnp.bfloat16 if args.rescan_dtype == "bf16" else jnp.float32
    db32 = jnp.asarray(db_np, store_dt)
    from mlvectordb_tpu.ops import pallas_knn_t as _p
    sweep_t = _p.to_sweep_layout(
        db32, dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32)
    sq = jnp.sum(db32.astype(jnp.float32) ** 2, axis=-1)
    valid = jnp.ones((N,), jnp.bool_)
    q = jnp.asarray(q_np)

    log(f"backend={jax.default_backend()}  N=2^{args.n} B={B} K={K} sweep={args.dtype}")
    hbm = 819e9

    def bench(name, fn, arglist, bytes_touched=0):
        ts = sorted(
            device_seconds_per_call(fn, arglist, iters=args.iters) for _ in range(3)
        )
        t = ts[len(ts) // 2]
        eff = f"  ~{bytes_touched / t / hbm * 100:4.1f}% HBM" if bytes_touched else ""
        log(f"{name:52s} {t*1e3:8.3f} ms  {B/t:10,.0f} QPS{eff} "
            f"(runs: {', '.join(f'{x*1e3:.2f}' for x in ts)})")
        return t

    only = os.environ.get("SELECT_ONLY", "").split(",") if os.environ.get("SELECT_ONLY") else None
    r1_only = {int(x) for x in os.environ.get("SELECT_R1", "").split(",") if x}

    def want(tag):
        if r1_only and "r1=" in tag and int(tag.split("r1=")[1].split()[0]) not in r1_only:
            return False
        return only is None or any(o and o in tag for o in only)

    sw_bytes = sweep_t.dtype.itemsize

    # full kernel across r1 (including sub-8 widths the heuristic never picks)
    for r1 in (2, 4, 8, 16, 32):
        if K * r1 > N or not want(f"full:{r1}"):
            continue

        def full_fn(qq, ddt, dd, vv, ss, _r1=r1):
            return pkt.exact_knn_pallas_t(qq, ddt, dd, vv, ss, k=K, metric="l2",
                                          live_prefix=N, r1_override=_r1)
        bench(f"full r1={r1}", full_fn, [q, sweep_t, db32, valid, sq],
              N * D * sw_bytes + B * (N // r1) * 4)

    # phase-1 sweep alone across r1 (grouped-emission kernel)
    srow = jnp.asarray(np.asarray(jax.device_get(
        pkt.sweep_rows_1d(sq))).reshape(1, N))
    for r1 in (2, 4, 8, 16, 32):
        if not want(f"p1:{r1}"):
            continue

        for passes in (1, 2) if sweep_t.dtype == jnp.bfloat16 else (1,):
            def p1_fn(qq, ddt, sr, _r1=r1, _p=passes):
                qf = -2.0 * qq
                qh = qf.astype(ddt.dtype)
                qres = ((qf - qh.astype(np.float32)).astype(ddt.dtype)
                        if _p == 2 else None)
                return pkt._window_mins(qh, qres, ddt, None, None, None, sr,
                                        q_tile=min(pkt.Q_TILE, B), g=pkt.R1MAX // _r1)
            bench(f"phase1-only r1={r1} passes={passes}", p1_fn, [q, sweep_t, srow],
                  N * D * sw_bytes + B * (N // r1) * 4)

    # carrier-dependent selection probes (sel2): wmin derived from the carrier so
    # nothing hoists out of the timing loop; isolates _select_and_rescan cost
    if want("sel2"):
        from mlvectordb_tpu.ops import pallas_knn_t as _pk

        for r1 in (2, 4, 8, 16, 32):
            if K * r1 > N or (r1_only and r1 not in r1_only):
                continue
            P = N // r1
            wbase = jnp.asarray(
                np.abs(rng.standard_normal((B, P)).astype(np.float32)) + 1.0)
            qn = jnp.sum(q * q, axis=-1)[:, None]

            def selfull_fn(qq, wb, dd, _r1=r1):
                wm = wb + qq[:, :1] * 0  # carrier-dependent
                qn_row = jnp.sum(qq * qq, axis=-1)[:, None]
                return _pk._select_and_rescan(
                    qq, qn_row, dd, dd[:, 0] * 0, jnp.int32(N), wm,
                    k=K, metric="l2", r1=_r1, masked=False)
            bench(f"sel2 full r1={r1}", selfull_fn, [q, wbase, db32], B * P * 4)

            def seltk_fn(qq, wb, _r1=r1):
                wm = wb + qq[:, :1] * 0
                W2 = (N // _r1) // 32
                wmin3 = wm.reshape(B, W2, 32)
                wmin2 = wmin3.min(-1)
                s2 = min(min(2 * K, K + 16), W2)
                v, i, _fl = _pk._topk_spec(wmin2, s2)
                return v.sum()[None]
            bench(f"sel2 lvl2+topk r1={r1}", seltk_fn, [q, wbase], B * P * 4)

            def selblk_fn(qq, wb, _r1=r1):
                wm = wb + qq[:, :1] * 0
                W2 = (N // _r1) // 32
                wmin3 = wm.reshape(B, W2, 32)
                wmin2 = wmin3.min(-1)
                s2 = min(min(2 * K, K + 16), W2)
                _, w2i, _fl = _pk._topk_spec(wmin2, s2)
                l1 = _pk._flat_rows(wmin3, w2i).reshape(B, s2 * 32)
                s1 = min(min(2 * K, K + 16), s2 * 32)
                v, pos, _fl2 = _pk._topk_spec(l1, s1)
                return v.sum()[None]
            bench(f"sel2 +blk+topk r1={r1}", selblk_fn, [q, wbase], B * P * 4)

    # micro: the selection sub-steps in isolation
    if want("micro"):
        from mlvectordb_tpu.ops.pallas_knn import R2

        for W1 in (N // 32, N // 8, N // 2):
            W2 = W1 // R2
            noise = jnp.asarray(rng.standard_normal((1, W1)).astype(np.float32))

            def lvl2_fn(qq, nz, _w2=W2):
                x = (qq[:, :1] + nz).reshape(B, _w2, R2)
                return x.min(-1).sum()[None]
            bench(f"micro reshape-min [B,{W1}]->[B,{W2}]", lvl2_fn, [q, noise],
                  B * W1 * 4)

        for W in (2048, 8192, 16384, 65536):
            kk = min(min(2 * K, K + 16), W)
            noise = jnp.asarray(rng.standard_normal((1, W)).astype(np.float32))

            def tk_fn(qq, nz, _k=kk):
                x = qq[:, :1] + nz
                v, i = jax.lax.top_k(x, _k)
                return v.sum()[None]
            bench(f"micro top_k [{B},{W}] k={kk}", tk_fn, [q, noise], B * W * 4)

        for rows_per_q in (1016, 2032, 4064, 8128):
            if rows_per_q > N:
                continue
            M = B * rows_per_q
            base_idx = jnp.asarray((rng.integers(0, N, M)).astype(np.int32))

            def g_fn(qq, dd, bi):
                idx = bi + (qq[0, 0] * 0).astype(jnp.int32)
                return dd[idx].sum()[None]
            bench(f"micro row-gather {rows_per_q}/q ({M} rows f32)", g_fn,
                  [q, db32, base_idx], M * D * 4)

        # rescan matmul alone at k=1000 width
        for rows_per_q in (1016, 2032):
            sub_fixed = jnp.asarray(
                rng.standard_normal((B, rows_per_q, D)).astype(np.float32))

            def mm_fn(qq, sb):
                d = jax.lax.dot_general(qq, sb, (((1,), (2,)), ((0,), (0,))),
                                        precision=jax.lax.Precision.HIGHEST,
                                        preferred_element_type=jnp.float32)
                return d.sum()[None]
            bench(f"micro rescan dots [B,{rows_per_q},D]", mm_fn, [q, sub_fixed],
                  B * rows_per_q * D * 4)

    # contiguous-window gathers: [N/r1, r1*Dp] reshaped view, flat row gather of
    # s1 windows/query — the rescan pattern of the permuted-mirror design
    if want("wingather"):
        for r1 in (4, 8, 16, 32):
            for s1 in (26, 116, 1016):
                M = B * s1
                if M * r1 > N:
                    continue
                dbw = db32.reshape(N // r1, r1 * D)
                widx = jnp.asarray(rng.integers(0, N // r1, M).astype(np.int32))

                def wg_fn(qq, dw, wi):
                    ii = wi + (qq[0, 0] * 0).astype(jnp.int32)
                    return dw[ii].sum()[None]
                bench(f"micro win-gather r1={r1} {s1}/q ({M} x {r1*D*4}B)", wg_fn,
                      [q, dbw, widx], M * r1 * D * 4)

    # block take_along (the level-1 refinement gather) at selection scale
    if want("blk"):
        from mlvectordb_tpu.ops.pallas_knn import R2 as _R2

        for (w2, nblk, blkw) in ((4096, min(K + 16, 4096), _R2),
                                 (16384, min(K + 16, 16384), _R2),
                                 (2048, min(K + 16, 2048), 8)):
            wm3 = jnp.asarray(rng.standard_normal((B, w2, blkw)).astype(np.float32))
            bi = jnp.asarray(rng.integers(0, w2, (B, nblk, 1)).astype(np.int32))

            def blk_fn(qq, wm, ii):
                ii = ii + (qq[0, 0] * 0).astype(jnp.int32)
                return jnp.take_along_axis(wm, ii, axis=1).sum()[None]
            bench(f"micro blk-gather [B,{w2},{blkw}]->{nblk}blk", blk_fn, [q, wm3, bi],
                  B * nblk * blkw * 4)

    # chunked top_k alternative for wide inputs at large k
    if want("chunked"):
        for W in (16384, 32768):
            kk = min(K + 16, W)
            noise = jnp.asarray(rng.standard_normal((1, W)).astype(np.float32))
            nch = W // 2048

            def ctk_fn(qq, nz, _k=kk, _n=nch, _w=W):
                x = (qq[:, :1] + nz).reshape(B * _n, _w // _n)
                kc = min(_k, _w // _n)
                v, i = jax.lax.top_k(x, kc)
                v = v.reshape(B, _n * kc)
                vv, _ = jax.lax.top_k(v, _k)
                return vv.sum()[None]
            bench(f"micro chunked top_k [{B},{W}] k={kk} via {nch}x2048", ctk_fn,
                  [q, noise], B * W * 4)

        # sort-based alternative to top_k for large k
        for W in (8192, 16384):
            noise = jnp.asarray(rng.standard_normal((1, W)).astype(np.float32))

            def sort_fn(qq, nz):
                x = qq[:, :1] + nz
                return jnp.sort(x, axis=-1)[:, :K].sum()[None]
            bench(f"micro full-sort [{B},{W}] take {K}", sort_fn, [q, noise],
                  B * W * 4)


if __name__ == "__main__":
    sys.exit(main())
