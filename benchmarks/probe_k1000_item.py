"""Itemize the PRODUCTION k=1000 selection structure (legacy [B, P] layout,
r1=4, two-level r2=32) under the honest barrier harness, plus alternatives:

  L0 wmin                                   [B, P]
  L1 + blockmin + level-2 top-s2 (pair-sort) + id sort
  L2 + supergather G=4 + onehot + L1 top_k (chunked spec) -> positions
  L3 full margin path (_select_and_rescan)
  ALT-flat : topk_spec directly on wmin [B, P] (no level 2)
  ALT-spec2: level-2 via chunked _topk_spec instead of the pair-sort

Run: python benchmarks/probe_k1000_item.py [N_log2=20] [k=1000]
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
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1000


def med(fn, args, runs=5, iters=8):
    device_seconds_per_call(fn, args, iters=2)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def main():
    print(f"backend={jax.default_backend()} N={N} B={B} k={K}", flush=True)
    rng = np.random.default_rng(42)
    data = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32))
    sq = jnp.sum(data * data, axis=-1)
    q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
    dbt = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)

    r1 = pkt._pick_r1(B, N, K)
    g = pkt.R1MAX // r1
    P = N // r1
    r2 = pkt.R2
    W2 = P // r2
    s = min(2 * K, K + 16)
    s2 = min(s, W2)
    print(f"r1={r1} P={P} W2={W2} s={s}", flush=True)
    bias_row = pkt.sweep_rows_1d(sq).reshape(1, N)

    def wmins(qq, ddt, br, dd):
        qh = (-2.0 * qq.astype(jnp.float32)).astype(jnp.bfloat16)
        return pkt._window_mins(qh, None, ddt, None, None, None, br,
                                q_tile=B, g=g)

    def sel_l1(qq, ddt, br, dd):
        wmin = wmins(qq, ddt, br, dd)
        wmin2 = wmin.reshape(B, W2, r2).min(axis=-1)
        v2, w2i = pkt._topk_min(wmin2, s2)
        return v2, jnp.sort(w2i, axis=1)

    def sel_l2(qq, ddt, br, dd):
        wmin = wmins(qq, ddt, br, dd)
        wmin3 = wmin.reshape(B, W2, r2)
        wmin2 = wmin3.min(axis=-1)
        v2, w2i = pkt._topk_min(wmin2, s2)
        w2i = jnp.sort(w2i, axis=1)
        G = 4
        sup = w2i // G
        mat = wmin.reshape(B * (W2 // G), G * r2)
        gidx = sup + (jnp.arange(B, dtype=sup.dtype) * (W2 // G))[:, None]
        rows4 = mat[gidx.reshape(-1)].reshape(B, s2, G, r2)
        onehot = (jnp.arange(G, dtype=jnp.int32)[None, None, :]
                  == (w2i % G)[:, :, None])
        l1_blk = jnp.sum(jnp.where(onehot[..., None], rows4, 0.0), axis=2)
        s1 = min(s, s2 * r2)
        v1, pos, floor = pkt._topk_spec(l1_blk.reshape(B, s2 * r2), s1)
        w2sel = jnp.take_along_axis(w2i, pos // r2, axis=1)
        return v1, w2sel * r2 + pos % r2

    def full(qq, ddt, br, dd):
        wmin = wmins(qq, ddt, br, dd)
        qq32 = qq.astype(jnp.float32)
        qn_row = jnp.sum(qq32 * qq32, axis=-1)[:, None]
        return pkt._select_and_rescan(
            qq32, qn_row, dd, None, jnp.int32(N), wmin,
            k=K, metric="l2", r1=r1, masked=False, s_sel=None, r2=r2)

    def _sel_positions(qq, ddt, br, dd):
        wmin = wmins(qq, ddt, br, dd)
        wmin3 = wmin.reshape(B, W2, r2)
        wmin2 = wmin3.min(axis=-1)
        v2, w2i = pkt._topk_min(wmin2, s2)
        w2i = jnp.sort(w2i, axis=1)
        G = 4
        sup = w2i // G
        mat = wmin.reshape(B * (W2 // G), G * r2)
        gidx = sup + (jnp.arange(B, dtype=sup.dtype) * (W2 // G))[:, None]
        rows4 = mat[gidx.reshape(-1)].reshape(B, s2, G, r2)
        onehot = (jnp.arange(G, dtype=jnp.int32)[None, None, :]
                  == (w2i % G)[:, :, None])
        l1_blk = jnp.sum(jnp.where(onehot[..., None], rows4, 0.0), axis=2)
        s1 = min(s, s2 * r2)
        v1, pos, floor = pkt._topk_spec(l1_blk.reshape(B, s2 * r2), s1)
        w2sel = jnp.take_along_axis(w2i, pos // r2, axis=1)
        p = w2sel * r2 + pos % r2
        return pkt._pos_to_window(p, g)

    def l3a_gather_dot(qq, ddt, br, dd):
        f = jnp.sort(_sel_positions(qq, ddt, br, dd), axis=1)
        qq32 = qq.astype(jnp.float32)
        dataw = dd.reshape(N // r1, r1 * D)
        sub = dataw[f.reshape(-1)].reshape(B, -1, D)
        dots = jax.lax.dot_general(qq32, sub, (((1,), (2,)), ((0,), (0,))),
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
        return dots

    def l3b_dist(qq, ddt, br, dd):
        f = jnp.sort(_sel_positions(qq, ddt, br, dd), axis=1)
        qq32 = qq.astype(jnp.float32)
        qn = jnp.sum(qq32 * qq32, axis=-1)[:, None]
        dataw = dd.reshape(N // r1, r1 * D)
        sub = dataw[f.reshape(-1)].reshape(B, -1, D)
        dots = jax.lax.dot_general(qq32, sub, (((1,), (2,)), ((0,), (0,))),
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
        sqn_c = jnp.sum(sub * sub, axis=-1)
        return jnp.maximum(qn + sqn_c - 2.0 * dots, 0.0)

    def l3c_final(qq, ddt, br, dd):
        dist = l3b_dist(qq, ddt, br, dd)
        return pkt._topk_min(dist, K)

    def alt_flat(qq, ddt, br, dd):
        wmin = wmins(qq, ddt, br, dd)
        v1, pos, floor = pkt._topk_spec(wmin, min(s, P))
        return v1, pos

    def alt_spec2(qq, ddt, br, dd):
        wmin = wmins(qq, ddt, br, dd)
        wmin2 = wmin.reshape(B, W2, r2).min(axis=-1)
        v2, w2i, fl = pkt._topk_spec(wmin2, s2)
        return v2, jnp.sort(w2i, axis=1)

    def l3a_barrier(qq, ddt, br, dd):
        f = jnp.sort(_sel_positions(qq, ddt, br, dd), axis=1)
        f = jax.lax.optimization_barrier(f)   # cut fusion across the boundary
        qq32 = qq.astype(jnp.float32)
        dataw = dd.reshape(N // r1, r1 * D)
        sub = dataw[f.reshape(-1)].reshape(B, -1, D)
        sub = jax.lax.optimization_barrier(sub)
        dots = jnp.sum(sub * qq32[:, None, :], axis=-1)
        sqn_c = jnp.sum(sub * sub, axis=-1)
        qn = jnp.sum(qq32 * qq32, axis=-1)[:, None]
        dist = jnp.maximum(qn + sqn_c - 2.0 * dots, 0.0)
        return pkt._topk_min(dist, K)

    stages = [("L0 wmin      ", wmins), ("L1 +L2sel    ", sel_l1),
              ("L2 +refine   ", sel_l2), ("L3a +gath+dot", l3a_gather_dot),
              ("L3b +dist    ", l3b_dist), ("L3c +finaltop", l3c_final),
              ("L3x +barrier ", l3a_barrier), ("L3 full path ", full)]
    prev = 0.0
    for name, fn in stages:
        t, ts = med(jax.jit(fn), [q, dbt, bias_row, data])
        print(f"{name}: {t*1e3:7.3f} ms  (delta {1e3*(t-prev):+7.3f})  "
              f"runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)
        prev = t


if __name__ == "__main__":
    main()
