"""Bisect the k=1000 certified path at 1M x 128 l2 (suite row; VERDICT r3 #3 target
>= 15K QPS = 8.5 ms/batch-128).  r1=4, s1 = k+16+k//8 = 1141.

Variants:
  1) sweep only (r1=4: wmin [B, 262144] f32)
  2) + L2 block reduce + level-2 selection (sort-based, s2=1141 of 8192)
  3) + super-gather + onehot + level-1 topk_spec (chunked)
  4) + rescan window gather (1141*4 rows/query, f32)
  5) + rescan dots + final top-1000 (= full margin)
  6) full certified (adds e_pos block bounds + check)

Run: python benchmarks/probe_k1000_bisect.py [N_log2=20]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.timing import device_seconds_per_call  # noqa: E402
from mlvectordb_tpu.ops import pallas_knn_t as pkt  # noqa: E402

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
D = 128
B = 128
K = 1000
R1 = 4


def med(fn, args, runs=5, iters=8):
    device_seconds_per_call(fn, args, iters=3)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def main():
    print(f"backend={jax.default_backend()} N={N} B={B} k={K} r1={R1}", flush=True)
    rng = np.random.default_rng(42)
    data = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32))
    sq = jnp.sum(data * data, axis=-1)
    valid = jnp.ones((N,), jnp.bool_)
    q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
    dbt = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)
    serr = pkt.sweep_err_norms(data)

    g = pkt.R1MAX // R1
    s = min(2 * K, K + 16 + K // 8)
    P = N // R1
    W2 = P // pkt.R2
    s2 = min(s, W2)
    print(f"P={P} W2={W2} s={s}", flush=True)

    def qprep_and_sweep(qq, ddt, ss):
        q32 = qq.astype(jnp.float32)
        bias_row = pkt.sweep_rows_1d(ss).reshape(1, N)
        q_fold = -2.0 * q32
        qh = q_fold.astype(jnp.bfloat16)
        qres = (q_fold - qh.astype(jnp.float32)).astype(jnp.bfloat16)
        wmin = pkt._window_mins(qh, qres, ddt, None, None, None, bias_row,
                                q_tile=B, g=g)
        return q32, wmin

    @jax.jit
    def v1(qq, ddt, ss):
        _, wmin = qprep_and_sweep(qq, ddt, ss)
        return wmin[:, :8]

    def sel_l2(wmin):
        wmin3 = wmin.reshape(B, W2, pkt.R2)
        wmin2 = wmin3.min(axis=-1)
        v2, w2i = pkt._topk_min(wmin2, s2)
        return wmin3, v2, jnp.sort(w2i, axis=1)

    @jax.jit
    def v2(qq, ddt, ss):
        _, wmin = qprep_and_sweep(qq, ddt, ss)
        _, v2_, w2i = sel_l2(wmin)
        return v2_[:, :4], w2i[:, :4]

    def sel_l1(wmin, wmin3, w2i):
        G = 4
        sup = w2i // G
        mat = wmin.reshape(B * (W2 // G), G * pkt.R2)
        gidx = sup + (jnp.arange(B, dtype=sup.dtype) * (W2 // G))[:, None]
        rows4 = mat[gidx.reshape(-1)].reshape(B, s2, G, pkt.R2)
        onehot = (jnp.arange(G, dtype=jnp.int32)[None, None, :] == (w2i % G)[:, :, None])
        l1_blk = jnp.sum(jnp.where(onehot[..., None], rows4, 0.0), axis=2)
        s1 = min(s, s2 * pkt.R2)
        v1_, pos, floor = pkt._topk_spec(l1_blk.reshape(B, s2 * pkt.R2), s1)
        w2sel = jnp.take_along_axis(w2i, pos // pkt.R2, axis=1)
        return v1_, w2sel * pkt.R2 + pos % pkt.R2

    @jax.jit
    def v3(qq, ddt, ss):
        _, wmin = qprep_and_sweep(qq, ddt, ss)
        wmin3, _, w2i = sel_l2(wmin)
        v1_, p = sel_l1(wmin, wmin3, w2i)
        return v1_[:, :4], p[:, :4]

    @jax.jit
    def v4(qq, ddt, ss, rescan):
        _, wmin = qprep_and_sweep(qq, ddt, ss)
        wmin3, _, w2i = sel_l2(wmin)
        _, p = sel_l1(wmin, wmin3, w2i)
        f = pkt._pos_to_window(p, g)
        cap, Dp = rescan.shape
        dataw = rescan.reshape(cap // R1, R1 * Dp)
        sub = dataw[f.reshape(-1)].reshape(B, f.shape[1] * R1, Dp)
        return jnp.sum(sub, axis=(1, 2))

    @jax.jit
    def v5(qq, ddt, rescan, vv, ss):
        return pkt.exact_knn_pallas_t(qq, ddt, rescan, vv, ss, k=K, metric="l2",
                                      live_prefix=N, r1_override=R1, certify=False)

    @jax.jit
    def v6(qq, ddt, rescan, vv, ss, se):
        return pkt.exact_knn_pallas_t(qq, ddt, rescan, vv, ss, k=K, metric="l2",
                                      live_prefix=N, r1_override=R1, sweep_err=se,
                                      certify=True)

    for name, fn, args in [
        ("1 sweep only      ", v1, [q, dbt, sq]),
        ("2 +L2 sel (sorted) ", v2, [q, dbt, sq]),
        ("3 +L1 sel (chunked)", v3, [q, dbt, sq]),
        ("4 +window gather   ", v4, [q, dbt, sq, data]),
        ("5 full margin      ", v5, [q, dbt, data, valid, sq]),
        ("6 full certified   ", v6, [q, dbt, data, valid, sq, serr]),
    ]:
        t, ts = med(fn, args)
        print(f"{name}: {t*1e3:7.3f} ms = {B/t:9,.0f} QPS  runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
