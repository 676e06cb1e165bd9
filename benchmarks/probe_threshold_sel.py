"""Threshold-select experiment for k=1000: pick a per-query rank threshold tau from
the (cheap) block-min distribution, then extract candidate windows with a
fixed-size vmapped nonzero — bypassing the refine top-k + super-gather entirely.
The certificate makes tau mis-estimates safe (too tight -> too few survivors ->
kth found too large -> escalate; truncation -> thresh falls below kth -> escalate).

Stages:
  T0 wmin + blockmin [B, W2]
  T1 + tau from sorted block-mins (value sort only)
  T2 + mask + vmapped nonzero(size=smax) -> window ids
  T3 + rescan + dist + final top-k  (the would-be full path)
  REF current full margin path for comparison

Run: python benchmarks/probe_threshold_sel.py [N_log2=20] [k=1000]
"""

from __future__ import annotations

import functools
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
    smax = 1 << (s - 1).bit_length()           # nonzero output size (pow2 pad)
    print(f"r1={r1} P={P} W2={W2} s={s} smax={smax}", flush=True)
    bias_row = pkt.sweep_rows_1d(sq).reshape(1, N)

    def wmins(qq, ddt, br, dd):
        qh = (-2.0 * qq.astype(jnp.float32)).astype(jnp.bfloat16)
        return pkt._window_mins(qh, None, ddt, None, None, None, br,
                                q_tile=B, g=g)

    def t0(qq, ddt, br, dd):
        wmin = wmins(qq, ddt, br, dd)
        return wmin.reshape(B, W2, r2).min(axis=-1)

    def _tau(wmin2):
        # sorted block-mins: block b's min bounds its r2 windows below; the
        # (s/r2 * slack)-th block-min is a cheap tau with expected window count
        # around s (each of the top blocks contributes ~1-2 true candidates)
        sv = jax.lax.sort(wmin2, dimension=-1)
        j = min(W2 - 1, max(1, (s // r2) * 4))
        return sv[:, j]

    def t1(qq, ddt, br, dd):
        wmin2 = t0(qq, ddt, br, dd)
        return _tau(wmin2)

    def t2(qq, ddt, br, dd):
        wmin = wmins(qq, ddt, br, dd)
        wmin2 = wmin.reshape(B, W2, r2).min(axis=-1)
        tau = _tau(wmin2)
        mask = wmin < tau[:, None]

        @functools.partial(jax.vmap)
        def extract(m):
            return jnp.nonzero(m, size=smax, fill_value=P - 1)[0]

        return extract(mask), jnp.sum(mask, axis=1)

    def t3(qq, ddt, br, dd):
        wmin = wmins(qq, ddt, br, dd)
        wmin2 = wmin.reshape(B, W2, r2).min(axis=-1)
        tau = _tau(wmin2)
        mask = wmin < tau[:, None]

        @functools.partial(jax.vmap)
        def extract(m):
            return jnp.nonzero(m, size=smax, fill_value=P - 1)[0]

        p = extract(mask)
        f = jnp.sort(pkt._pos_to_window(p, g), axis=1)
        qq32 = qq.astype(jnp.float32)
        qn = jnp.sum(qq32 * qq32, axis=-1)[:, None]
        dataw = dd.reshape(P, r1 * D)
        sub = dataw[f.reshape(-1)].reshape(B, smax * r1, D)
        dots = jnp.sum(sub * qq32[:, None, :], axis=-1)
        sqn_c = jnp.sum(sub * sub, axis=-1)
        dist = jnp.maximum(qn + sqn_c - 2.0 * dots, 0.0)
        return pkt._topk_min(dist, K)

    def ref(qq, ddt, br, dd):
        wmin = wmins(qq, ddt, br, dd)
        qq32 = qq.astype(jnp.float32)
        qn_row = jnp.sum(qq32 * qq32, axis=-1)[:, None]
        return pkt._select_and_rescan(
            qq32, qn_row, dd, None, jnp.int32(N), wmin,
            k=K, metric="l2", r1=r1, masked=False, s_sel=None, r2=r2)

    # sanity: recall of the threshold path vs oracle, and survivor counts
    d_np = np.asarray(data)
    q_np = np.asarray(q)
    d_or = ((d_np ** 2).sum(-1)[None, :] - 2.0 * (q_np @ d_np.T)
            + (q_np ** 2).sum(-1)[:, None])
    i_or = np.argpartition(d_or, K, axis=1)[:, :K]
    ids, counts = jax.jit(t2)(q, dbt, bias_row, data)
    counts = np.asarray(counts)
    print(f"survivor windows: min={counts.min()} med={int(np.median(counts))} "
          f"max={counts.max()} (smax={smax})", flush=True)
    dd_, ii_ = jax.jit(t3)(q, dbt, bias_row, data)
    ii_ = np.asarray(ii_)
    rec = np.mean([len(set(ii_[b].tolist()) & set(i_or[b].tolist())) / K
                   for b in range(B)])
    print(f"threshold-path recall@{K}: {rec:.5f}", flush=True)

    for name, fn in [("T0 blockmin ", t0), ("T1 +tau     ", t1),
                     ("T2 +nonzero ", t2), ("T3 +rescan  ", t3),
                     ("REF current ", ref)]:
        t, ts = med(jax.jit(fn), [q, dbt, bias_row, data])
        print(f"{name}: {t*1e3:7.3f} ms  runs={['%.2f'%(x*1e3) for x in ts]}",
              flush=True)


if __name__ == "__main__":
    main()
