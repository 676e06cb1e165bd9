"""Round-4 probe: stage-by-stage cost of the k=1000 selection path (margin widths).

Rebuilds _select_and_rescan's two-level branch stage by stage on a REAL wmin
(phase-1 output), timing cumulative prefixes — the sel2 lab probes approximate the
path; this measures the composed ops exactly.

Run on TPU:  python benchmarks/probe_sel1000.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.timing import device_seconds_per_call  # noqa: E402
from mlvectordb_tpu.ops import pallas_knn_t as pkt  # noqa: E402


B, D, K = 128, 128, 1000
N = 1 << 20
R1 = 2
G = pkt.R1MAX // R1
P = N // R1
R2 = pkt.R2
W2 = P // R2
S = min(2 * K, K + 16)  # margin width


def main():
    print(f"backend={jax.default_backend()} P={P} W2={W2} s={S}", flush=True)
    rng = np.random.default_rng(7)
    data = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    sq = jnp.sum(data * data, axis=-1)
    data_t = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    srow = pkt.sweep_rows_1d(sq).reshape(1, N)
    jax.block_until_ready((data, sq, data_t, srow))

    def wmin_of(qq, ddt, sr):
        qf = -2.0 * qq
        qh = qf.astype(jnp.bfloat16)
        return pkt._window_mins(qh, None, ddt, None, None, None, sr,
                                q_tile=min(pkt.Q_TILE, B), g=G)

    def stageA(qq, ddt, sr):  # wmin + blockmin + block top_k (spec) + sort ids
        wmin = wmin_of(qq, ddt, sr)
        wmin3 = wmin.reshape(B, W2, R2)
        v2, w2i, fl2 = pkt._topk_spec(wmin3.min(-1), min(S, W2))
        return (v2.sum() + w2i.sum())[None]

    def stageB(qq, ddt, sr):  # + super-row gather + onehot reduce -> l1_blk
        wmin = wmin_of(qq, ddt, sr)
        wmin3 = wmin.reshape(B, W2, R2)
        v2, w2i, fl2 = pkt._topk_spec(wmin3.min(-1), min(S, W2))
        w2i = jnp.sort(w2i, axis=1)
        s2 = w2i.shape[1]
        sup = w2i // 4
        mat = wmin.reshape(B * (W2 // 4), 4 * R2)
        gidx = sup + (jnp.arange(B, dtype=sup.dtype) * (W2 // 4))[:, None]
        rows4 = mat[gidx.reshape(-1)].reshape(B, s2, 4, R2)
        onehot = (jnp.arange(4, dtype=jnp.int32)[None, None, :] == (w2i % 4)[:, :, None])
        l1_blk = jnp.sum(jnp.where(onehot[..., None], rows4, 0.0), axis=2)
        return l1_blk.sum()[None]

    def stageC(qq, ddt, sr):  # + per-block top-m + global pair-sort -> positions
        wmin = wmin_of(qq, ddt, sr)
        wmin3 = wmin.reshape(B, W2, R2)
        v2, w2i, fl2 = pkt._topk_spec(wmin3.min(-1), min(S, W2))
        w2i = jnp.sort(w2i, axis=1)
        s2 = w2i.shape[1]
        sup = w2i // 4
        mat = wmin.reshape(B * (W2 // 4), 4 * R2)
        gidx = sup + (jnp.arange(B, dtype=sup.dtype) * (W2 // 4))[:, None]
        rows4 = mat[gidx.reshape(-1)].reshape(B, s2, 4, R2)
        onehot = (jnp.arange(4, dtype=jnp.int32)[None, None, :] == (w2i % 4)[:, :, None])
        l1_blk = jnp.sum(jnp.where(onehot[..., None], rows4, 0.0), axis=2)
        m = min(R2, max(4, -(-S // s2) + 2))
        negm, posm = jax.lax.top_k(-l1_blk.reshape(B * s2, R2), m)
        vals_m = (-negm).reshape(B, s2 * m)
        v1, sel = pkt._topk_min(vals_m, min(S, s2 * m))
        p = (jnp.take_along_axis(w2i, sel // m, axis=1) * R2
             + jnp.take_along_axis(posm.reshape(B, s2 * m), sel, axis=1))
        return p.sum().astype(jnp.float32)[None]

    def stageD(qq, ddt, sr, da):  # + window gather + rescan dists (no final sel)
        wmin = wmin_of(qq, ddt, sr)
        wmin3 = wmin.reshape(B, W2, R2)
        v2, w2i, fl2 = pkt._topk_spec(wmin3.min(-1), min(S, W2))
        w2i = jnp.sort(w2i, axis=1)
        s2 = w2i.shape[1]
        sup = w2i // 4
        mat = wmin.reshape(B * (W2 // 4), 4 * R2)
        gidx = sup + (jnp.arange(B, dtype=sup.dtype) * (W2 // 4))[:, None]
        rows4 = mat[gidx.reshape(-1)].reshape(B, s2, 4, R2)
        onehot = (jnp.arange(4, dtype=jnp.int32)[None, None, :] == (w2i % 4)[:, :, None])
        l1_blk = jnp.sum(jnp.where(onehot[..., None], rows4, 0.0), axis=2)
        m = min(R2, max(4, -(-S // s2) + 2))
        negm, posm = jax.lax.top_k(-l1_blk.reshape(B * s2, R2), m)
        vals_m = (-negm).reshape(B, s2 * m)
        v1, sel = pkt._topk_min(vals_m, min(S, s2 * m))
        p = (jnp.take_along_axis(w2i, sel // m, axis=1) * R2
             + jnp.take_along_axis(posm.reshape(B, s2 * m), sel, axis=1))
        f = pkt._pos_to_window(p, G)
        dataw = da.reshape(N // R1, R1 * D)
        sub = dataw[f.reshape(-1)].reshape(B, -1, D).astype(jnp.float32)
        dots = jax.lax.dot_general(qq, sub, (((1,), (2,)), ((0,), (0,))),
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
        sqn_c = jnp.sum(sub * sub, axis=-1)
        dist = jnp.maximum(jnp.sum(qq * qq, -1)[:, None] + sqn_c - 2 * dots, 0.0)
        return dist.sum()[None]

    def stageF(qq, ddt, da, vv, ss):  # full margin path
        d, i = pkt.exact_knn_pallas_t(qq, ddt, da, vv, ss, k=K, metric="l2",
                                      live_prefix=N, certify=False)
        return d

    valid = jnp.ones((N,), jnp.bool_)
    stages = [
        ("A wmin+blockmin+blocksel", stageA, [q, data_t, srow]),
        ("B +supergather+onehot", stageB, [q, data_t, srow]),
        ("C +topm+pairsort", stageC, [q, data_t, srow]),
        ("D +wingather+rescan", stageD, [q, data_t, srow, data]),
        ("F full margin path", stageF, [q, data_t, data, valid, sq]),
    ]
    for name, fn, args in stages:
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn(*args)))[()]
        c = time.perf_counter() - t0
        sec = device_seconds_per_call(fn, args, iters=8)
        print(f"{name:28s} {sec*1e3:8.3f} ms (first-call {c:5.1f} s)", flush=True)


if __name__ == "__main__":
    main()
