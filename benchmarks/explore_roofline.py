"""Round-2 roofline exploration: measure kernel variants on the real chip.

Not part of the test suite — a lab notebook for picking the headline configuration.
Run: python benchmarks/explore_roofline.py [--n 20] [--b 128]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20, help="log2 database rows")
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks.timing import device_seconds_per_call
    from mlvectordb_tpu.ops import pallas_knn as pk

    N, D, B, K = 1 << args.n, 128, args.b, args.k
    rng = np.random.default_rng(42)
    db_np = rng.standard_normal((N, D), dtype=np.float32)
    q_np = rng.standard_normal((B, D), dtype=np.float32)

    db32 = jnp.asarray(db_np)
    db16 = db32.astype(jnp.bfloat16)
    sq = jnp.sum(db32 * db32, axis=-1)
    valid = jnp.ones((N,), jnp.bool_)
    q = jnp.asarray(q_np)

    log(f"backend={jax.default_backend()}  N=2^{args.n} B={B} K={K}")
    hbm = 819e9  # v5e nominal bytes/s

    def bench(name, fn, arglist, bytes_touched):
        ts = sorted(
            device_seconds_per_call(fn, arglist, iters=args.iters) for _ in range(5)
        )
        t = ts[len(ts) // 2]
        eff = bytes_touched / t / hbm * 100
        log(f"{name:44s} {t*1e3:7.3f} ms  {B/t:10,.0f} QPS  ~{eff:4.1f}% HBM "
            f"(runs: {', '.join(f'{x*1e3:.2f}' for x in ts)})")
        return t

    only = os.environ.get("ROOFLINE_ONLY", "").split(",") if os.environ.get("ROOFLINE_ONLY") else None

    def want(tag):
        return only is None or any(o and o in tag for o in only)

    # composition probes: where does full-pipeline time go?
    from mlvectordb_tpu.ops import pallas_knn_t as _pkt

    if want("probe"):
        hw_ = jnp.asarray([[N]], jnp.int32)
        db16t_ = jnp.asarray(np.ascontiguousarray(db_np.T).astype(jnp.bfloat16))
        sqn_row = sq.reshape(1, N)

        def probe_p1sum(qq, ddt, srow):  # phase1 + scalar reduce, no select
            qh = (-2.0 * qq).astype(ddt.dtype)
            wm = _pkt._window_mins_t(qh, ddt, srow, srow, hw_,
                                     q_tile=min(_pkt.Q_TILE, B), db_tile=_pkt.DB_TILE,
                                     r1=16, use_scale=False, use_bias=True, tail_mask=False)
            return wm.sum()[None]
        bench("probe phase1+sum (no select)", probe_p1sum, [q, db16t_, sqn_row],
              N * D * 2 + B * (N // 16) * 4)

        def probe_full(qq, ddt, dd, ss, srow):  # phase1 + select, hand-composed
            qh = (-2.0 * qq).astype(ddt.dtype)
            wm = _pkt._window_mins_t(qh, ddt, srow, srow, hw_,
                                     q_tile=min(_pkt.Q_TILE, B), db_tile=_pkt.DB_TILE,
                                     r1=16, use_scale=False, use_bias=True, tail_mask=False)
            qn_row = jnp.sum(qq * qq, axis=-1)[:, None]
            return _pkt._select_and_rescan_t(qq, qn_row, dd, ss, jnp.int32(N), wm,
                                             k=K, metric="l2", db_tile=_pkt.DB_TILE,
                                             masked=False, r1=16)
        bench("probe phase1+select (hand-composed)", probe_full, [q, db16t_, db32, sq, sqn_row],
              N * D * 2 + B * (N // 16) * 4)

    # micro-probes for phase-2 components (all carrier-dependent to defeat hoisting)
    if want("micro"):
        M = 40960
        noise2k = jnp.asarray(rng.standard_normal((1, 2048)).astype(np.float32))
        noise64k = jnp.asarray(rng.standard_normal((1, 65536)).astype(np.float32))
        base_idx = jnp.asarray((rng.integers(0, N, M)).astype(np.int32))

        def g_fn(qq, dd, bi):
            idx = bi + (qq[0, 0] * 0).astype(jnp.int32)
            return dd[idx].sum()[None]
        bench(f"micro row-gather {M} rows f32", g_fn, [q, db32, base_idx], M * D * 4)

        def g16_fn(qq, dd, bi):
            idx = bi + (qq[0, 0] * 0).astype(jnp.int32)
            return dd[idx].astype(jnp.float32).sum()[None]
        bench(f"micro row-gather {M} rows bf16", g16_fn, [q, db16, base_idx], M * D * 2)

        def tk_fn(qq, nz):
            x = qq[:, :1] + nz
            v, i = jax.lax.top_k(x, 20)
            return v.sum()[None]
        bench("micro top_k [128,2048] k=20", tk_fn, [q, noise2k], B * 2048 * 4)

        def rd_fn(qq, nz):
            x = qq[:, :1] + nz
            return x.reshape(B, 2048, 32).min(-1).sum()[None]
        bench("micro bcast+reduce [128,65536]", rd_fn, [q, noise64k], B * 65536 * 4)

        def ta_fn(qq, nz):
            x = qq[:, :1] + nz  # [B, 65536]
            ids = jnp.broadcast_to(jnp.arange(640, dtype=jnp.int32)[None, :], (B, 640)) * 64
            return jnp.take_along_axis(x, ids, axis=1).sum()[None]
        bench("micro take_along [128,65536]->640", ta_fn, [q, noise64k], B * 65536 * 4)

    # second micro round: alternatives for the slow minor-axis gathers
    if want("micro2"):
        m1 = 320
        sub_fixed = jnp.asarray(rng.standard_normal((B, m1, D)).astype(np.float32))
        wmin3 = jnp.asarray(rng.standard_normal((B, 2048, 32)).astype(np.float32))
        w2i_fixed = jnp.asarray(rng.integers(0, 2048, (B, 20, 1)).astype(np.int32))
        noise32k = jnp.asarray(rng.standard_normal((1, 32768)).astype(np.float32))

        def be_fn(qq, sb):  # batched einsum bd,bmd->bm (round-1 rescan dots)
            return jnp.einsum("bd,bmd->bm", qq, sb,
                              preferred_element_type=jnp.float32).sum()[None]
        bench("micro2 batched einsum bd,bmd->bm", be_fn, [q, sub_fixed], B * m1 * D * 4)

        def be_hi_fn(qq, sb):
            d = jax.lax.dot_general(qq, sb, (((1,), (2,)), ((0,), (0,))),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
            return d.sum()[None]
        bench("micro2 batched dot HIGHEST", be_hi_fn, [q, sub_fixed], B * m1 * D * 4)

        def blk_fn(qq, wm3, wi):
            wi = wi + (qq[0, 0] * 0).astype(jnp.int32)
            out = jnp.take_along_axis(wm3, wi, axis=1)  # [B, 20, 32] block slices
            return out.sum()[None]
        bench("micro2 block take_along [B,2048,32]->20blk", blk_fn, [q, wmin3, w2i_fixed],
              B * 2048 * 32 * 4)

        def diag_fn(qq, sb):
            # diagonal-extraction dense dots, QCH=8
            outs = []
            for b0 in range(0, B, 8):
                flat = sb[b0:b0 + 8].reshape(8 * m1, D)
                d = jax.lax.dot_general(qq[b0:b0 + 8], flat, (((1,), (1,)), ((), ())),
                                        precision=jax.lax.Precision.HIGHEST,
                                        preferred_element_type=jnp.float32)
                d3 = d.reshape(8, 8, m1)
                outs.append(jnp.diagonal(d3, axis1=0, axis2=1).T)  # [8? m1] -> [m1, 8].T
            return jnp.concatenate(outs, 0).sum()[None]
        bench("micro2 dense+diagonal QCH=8", diag_fn, [q, sub_fixed], B * m1 * D * 4)

        def tk32_fn(qq, nz):
            x = qq[:, :1] + nz
            v, i = jax.lax.top_k(x, 20)
            return v.sum()[None]
        bench("micro2 top_k [128,32768] k=20", tk32_fn, [q, noise32k], B * 32768 * 4)

    # transposed-sweep kernel (pallas_knn_t): the round-2 roofline design
    from mlvectordb_tpu.ops import pallas_knn_t as pkt

    db32t = db32.T
    db16t = db16.T
    for r1 in (8, 16, 32):
        if K * r1 > N:
            continue

        def t32_fn(qq, ddt, dd, vv, ss, _r1=r1):
            return pkt.exact_knn_pallas_t(qq, ddt, dd, vv, ss, k=K, metric="l2",
                                          live_prefix=N, r1_override=_r1)
        if want(f"t32:{r1}"):
            bench(f"T f32 sweep r1={r1}", t32_fn, [q, db32t, db32, valid, sq],
                  N * D * 4 + B * (N // r1) * 4)

        def t16_fn(qq, ddt, dd, vv, ss, _r1=r1):
            return pkt.exact_knn_pallas_t(qq, ddt, dd, vv, ss, k=K, metric="l2",
                                          live_prefix=N, r1_override=_r1)
        if want(f"t16:{r1}"):
            bench(f"T bf16 sweep + f32 rescan r1={r1}", t16_fn, [q, db16t, db32, valid, sq],
                  N * D * 2 + B * (N // r1) * 4)

        def t16m_fn(qq, ddt, dd, vv, ss, _r1=r1):
            return pkt.exact_knn_pallas_t(qq, ddt, dd, vv, ss, k=K, metric="l2",
                                          live_prefix=None, r1_override=_r1)
        if want(f"t16m:{r1}"):
            bench(f"T bf16 MASKED + f32 rescan r1={r1}", t16m_fn, [q, db16t, db32, valid, sq],
                  N * D * 2 + B * (N // r1) * 4)

    # phase-split attribution: time the Pallas sweep alone vs the selection alone
    hw = jnp.asarray([[N]], jnp.int32)
    for r1 in (8, 16, 32):
        if want(f"phase1:{r1}"):
            def p1_fn(qq, dd, _r1=r1):
                qt = qq.T.astype(dd.dtype)
                qn = jnp.sum(qq * qq, axis=-1).reshape(1, -1)
                return pk._window_mins_fast(dd, qt, qn, hw, metric="l2",
                                            q_tile=min(pk.Q_TILE, B), db_tile=pk.DB_TILE, r1=_r1)
            bench(f"phase1-only bf16 r1={r1}", p1_fn, [q, db16],
                  N * D * 2 + B * (N // r1) * 4)
            bench(f"phase1-only f32  r1={r1}", p1_fn, [q, db32],
                  N * D * 4 + B * (N // r1) * 4)

        if want(f"tphase1:{r1}"):
            def tp1_fn(qq, ddt, _r1=r1):
                qh = (-2.0 * qq).astype(ddt.dtype)
                zr = jnp.zeros((1, ddt.shape[1]), jnp.float32)
                return pkt._window_mins_t(qh, ddt, zr, zr, hw,
                                          q_tile=min(pkt.Q_TILE, B), db_tile=pkt.DB_TILE,
                                          r1=_r1, use_scale=False, use_bias=True,
                                          tail_mask=False)
            bench(f"T phase1-only bf16 r1={r1}", tp1_fn, [q, db16t],
                  N * D * 2 + B * (N // r1) * 4)
            bench(f"T phase1-only f32  r1={r1}", tp1_fn, [q, db32t],
                  N * D * 4 + B * (N // r1) * 4)

        if want(f"select:{r1}"):
            # selection+rescan alone, fed a precomputed window-min matrix
            wmin = jnp.asarray(
                np.abs(rng.standard_normal((B, N // r1)).astype(np.float32)) + 1.0
            )

            def sel_fn(qq, wm, dd, ss, _r1=r1):
                qn_row = jnp.sum(qq * qq, axis=-1)[:, None]
                return pkt._select_and_rescan_t(
                    qq, qn_row, dd, ss, jnp.int32(N), wm,
                    k=K, metric="l2", db_tile=pkt.DB_TILE, masked=False, r1=_r1,
                )
            bench(f"select+rescan-only r1={r1}", sel_fn, [q, wmin, db32, sq],
                  B * (N // r1) * 4)

    for r1 in (8, 16, 32):
        if K * r1 > N:
            continue
        # f32 storage (phase-1 HIGHEST)
        def f32_fn(qq, dd, vv, ss, _r1=r1):
            return pk.exact_knn_pallas(qq, dd, vv, ss, k=K, metric="l2",
                                       live_prefix=N, r1_override=_r1)
        if want(f"f32:{r1}"):
            bench(f"f32  r1={r1}", f32_fn, [q, db32, valid, sq],
                  N * D * 4 + B * (N // r1) * 4)
        # bf16 storage
        def bf16_fn(qq, dd, vv, ss, _r1=r1):
            return pk.exact_knn_pallas(qq, dd, vv, ss, k=K, metric="l2",
                                       live_prefix=N, r1_override=_r1)
        if want(f"bf16:{r1}"):
            bench(f"bf16 r1={r1}", bf16_fn, [q, db16, valid, sq],
                  N * D * 2 + B * (N // r1) * 4)
        # bf16 sweep + f32 rescan (two-buffer exact mode).  The f32 copy MUST be passed
        # as an argument, not closure-captured (512MB HLO literal -> relay rejects).
        def mixed_fn(qq, dd, vv, ss, dd32, _r1=r1):
            return pk.exact_knn_pallas(qq, dd, vv, ss, k=K, metric="l2",
                                       live_prefix=N, r1_override=_r1,
                                       rescan_data=dd32)
        if want(f"mixed:{r1}"):
            bench(f"bf16 sweep + f32 rescan r1={r1}", mixed_fn, [q, db16, valid, sq, db32],
                  N * D * 2 + B * (N // r1) * 4)


if __name__ == "__main__":
    sys.exit(main())
