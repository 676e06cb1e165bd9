"""Round-4 probe: itemize _select_and_rescan at k=10 (VERDICT r3 #2).

Times the phase-2 subgraph alone on a precomputed window-min matrix:
  a) selection only (two-level top-k -> window ids)
  b) rescan gather only (window rows -> [B, s1*r1, Dp])
  c) full select+rescan
Run on the real TPU:  python benchmarks/probe_sel10.py [N_log2] [k]
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
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def med(fn, args, runs=5, iters=24):
    device_seconds_per_call(fn, args, iters=6)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def main():
    print(f"backend={jax.default_backend()} N={N} D={D} B={B} k={K}", flush=True)
    rng = np.random.default_rng(42)
    data_np = rng.standard_normal((N, D), dtype=np.float32)
    q_np = rng.standard_normal((B, D), dtype=np.float32)

    data = jnp.asarray(data_np)
    sq = jnp.sum(data * data, axis=-1)
    q32 = jnp.asarray(q_np)
    qn_row = jnp.sum(q32 * q32, axis=-1)[:, None]

    r1 = pkt._pick_r1(B, N, K)
    P = N // r1
    s = min(2 * K, K + 16)
    print(f"r1={r1} P={P} s={s}", flush=True)
    # synthetic window-min matrix with realistic distribution (values don't matter
    # for timing; shapes/dtypes do).  NOTE: must depend on the carrier arg (the
    # timing harness hoists loop-invariant computation), so wmin rides as an arg.
    wmin = jnp.asarray(rng.standard_normal((B, P), dtype=np.float32) + 10.0)
    maskadd = jnp.zeros((N,), jnp.float32)
    hw = jnp.int32(N)

    # ---- a) selection only ------------------------------------------------------
    @jax.jit
    def sel_only(q32_, wmin_):
        # replicate the two-level selection from _select_and_rescan
        wmin_ = wmin_ + q32_[0, 0] * 0.0  # carrier dependence (hoisting guard)
        W2 = P // pkt.R2
        wmin3 = wmin_.reshape(B, W2, pkt.R2)
        wmin2 = wmin3.min(axis=-1)
        s2 = min(s, W2)
        v2, w2i = pkt._topk_min(wmin2, s2)
        w2i = jnp.sort(w2i, axis=1)
        G = 4
        sup = w2i // G
        mat = wmin_.reshape(B * (W2 // G), G * pkt.R2)
        gidx = sup + (jnp.arange(B, dtype=sup.dtype) * (W2 // G))[:, None]
        rows4 = mat[gidx.reshape(-1)].reshape(B, s2, G, pkt.R2)
        onehot = (jnp.arange(G, dtype=jnp.int32)[None, None, :] == (w2i % G)[:, :, None])
        l1_blk = jnp.sum(jnp.where(onehot[..., None], rows4, 0.0), axis=2)
        s1 = min(s, s2 * pkt.R2)
        v1, pos, floor = pkt._topk_spec(l1_blk.reshape(B, s2 * pkt.R2), s1)
        w2sel = jnp.take_along_axis(w2i, pos // pkt.R2, axis=1)
        p = w2sel * pkt.R2 + pos % pkt.R2
        return p

    t, ts = med(sel_only, [q32, wmin])
    print(f"a) selection only : {t*1e3:7.3f} ms  runs={['%.3f'%(x*1e3) for x in ts]}", flush=True)
    p_fixed = sel_only(q32, wmin)
    f_fixed = pkt._pos_to_window(p_fixed, pkt.R1MAX // r1)

    # ---- b) rescan gather only ---------------------------------------------------
    @jax.jit
    def gather_only(q32_, f, rescan):
        cap, Dp = rescan.shape
        f = f + jnp.round(q32_[0, 0] * 0.0).astype(jnp.int32)  # carrier dependence
        dataw = rescan.reshape(cap // r1, r1 * Dp)
        sub = dataw[f.reshape(-1)].reshape(B, f.shape[1] * r1, Dp).astype(jnp.float32)
        return jnp.sum(sub)  # consume

    t, ts = med(gather_only, [q32, f_fixed, data])
    gb = B * f_fixed.shape[1] * r1 * D * 4 / 1e9
    print(f"b) rescan gather  : {t*1e3:7.3f} ms  ({gb/t:6.0f} GB/s for {gb*1e3:.0f} MB)  runs={['%.3f'%(x*1e3) for x in ts]}", flush=True)

    # ---- c) rescan compute given gathered ----------------------------------------
    @jax.jit
    def rescan_given(q32_, f, rescan):
        cap, Dp = rescan.shape
        f = f + jnp.round(q32_[0, 0] * 0.0).astype(jnp.int32)  # carrier dependence
        dataw = rescan.reshape(cap // r1, r1 * Dp)
        sub = dataw[f.reshape(-1)].reshape(B, f.shape[1] * r1, Dp).astype(jnp.float32)
        rows = (f[:, :, None] * r1 + jnp.arange(r1, dtype=jnp.int32)).reshape(B, -1)
        dots = jax.lax.dot_general(q32_, sub, dimension_numbers=(((1,), (2,)), ((0,), (0,))),
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
        sqn_c = jnp.sum(sub * sub, axis=-1)
        dist = jnp.maximum(qn_row + sqn_c - 2.0 * dots, 0.0)
        kk = min(K, dist.shape[1])
        best_d, pk = pkt._topk_min(dist, kk)
        return best_d, jnp.take_along_axis(rows, pk, axis=1)

    t, ts = med(rescan_given, [q32, f_fixed, data])
    print(f"c) gather+rescan  : {t*1e3:7.3f} ms  runs={['%.3f'%(x*1e3) for x in ts]}", flush=True)

    # ---- d) full _select_and_rescan ----------------------------------------------
    @jax.jit
    def full(q32_, wmin_, rescan, maskadd_):
        return pkt._select_and_rescan(q32_, qn_row, rescan, maskadd_, hw, wmin_,
                                      k=K, metric="l2", r1=r1, masked=False)

    t, ts = med(full, [q32, wmin, data, maskadd])
    print(f"d) full sel+rescan: {t*1e3:7.3f} ms  runs={['%.3f'%(x*1e3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
