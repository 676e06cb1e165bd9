"""Bisect the DEEP-10M-shape row (8.4M x 128 bf16, cosine k=10, same-dtype sweep):
round-3 measured 21K QPS = 6.1 ms/batch-128 vs a ~2.6 ms HBM floor.  Where's the rest?

Variants:
  1) sweep only (window mins, cosine scale)
  2) + L2 selection
  3) + full selection
  4) + window gather (bf16 rescan rows)
  5) full certified fused (the suite row)
  6) full margin fused

Run: python benchmarks/probe_deep_bisect.py [N_log2=23]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.timing import device_seconds_per_call  # noqa: E402
from mlvectordb_tpu.ops import pallas_knn_t as pkt  # noqa: E402

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 23)
D = 128
B = 128
K = 10


def med(fn, args, runs=5, iters=8):
    device_seconds_per_call(fn, args, iters=3)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def main():
    print(f"backend={jax.default_backend()} N={N} B={B} k={K} same-dtype bf16 cosine", flush=True)
    rng = np.random.default_rng(42)
    data = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32)).astype(jnp.bfloat16)
    sq = jnp.sum(data.astype(jnp.float32) ** 2, axis=-1)
    valid = jnp.ones((N,), jnp.bool_)
    q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
    dbt = pkt.to_sweep_layout(data)

    r1 = 32
    g = pkt.R1MAX // r1
    s = min(2 * K, K + 16)

    def qprep_and_sweep(qq, ddt, ss):
        q32 = qq.astype(jnp.float32)
        sfac = jax.lax.rsqrt(jnp.maximum(ss, 1e-30))
        bias_row = jnp.zeros((1, N), jnp.float32)
        scale_row = pkt.sweep_rows_1d(sfac).reshape(1, N)
        qh = (-q32).astype(jnp.bfloat16)
        wmin = pkt._window_mins(qh, None, ddt, None, None, scale_row, bias_row,
                                q_tile=B, g=g)
        return q32, wmin

    @jax.jit
    def v1(qq, ddt, ss):
        _, wmin = qprep_and_sweep(qq, ddt, ss)
        return wmin[:, :8]

    @jax.jit
    def v2(qq, ddt, ss):
        _, wmin = qprep_and_sweep(qq, ddt, ss)
        P = wmin.shape[1]
        W2 = P // pkt.R2
        wmin2 = wmin.reshape(B, W2, pkt.R2).min(axis=-1)
        return pkt._topk_min(wmin2, min(s, W2))

    @jax.jit
    def v3(qq, ddt, ss):
        _, wmin = qprep_and_sweep(qq, ddt, ss)
        P = wmin.shape[1]
        W2 = P // pkt.R2
        wmin3 = wmin.reshape(B, W2, pkt.R2)
        wmin2 = wmin3.min(axis=-1)
        s2 = min(s, W2)
        _, w2i = pkt._topk_min(wmin2, s2)
        w2i = jnp.sort(w2i, axis=1)
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
    def v4(qq, ddt, ss, rescan):
        _, p = v3.__wrapped__(qq, ddt, ss)
        f = pkt._pos_to_window(p, g)
        cap, Dp = rescan.shape
        dataw = rescan.reshape(cap // r1, r1 * Dp)
        sub = dataw[f.reshape(-1)].reshape(B, f.shape[1] * r1, Dp)
        return jnp.sum(sub.astype(jnp.float32), axis=(1, 2))

    @jax.jit
    def v5(qq, ddt, rescan, vv, ss):
        return pkt.exact_knn_pallas_t(qq, ddt, rescan, vv, ss, k=K, metric="cosine",
                                      live_prefix=N, certify=True)

    @jax.jit
    def v6(qq, ddt, rescan, vv, ss):
        return pkt.exact_knn_pallas_t(qq, ddt, rescan, vv, ss, k=K, metric="cosine",
                                      live_prefix=N, certify=False)

    for name, fn, args in [
        ("1 sweep only     ", v1, [q, dbt, sq]),
        ("2 +L2 selection  ", v2, [q, dbt, sq]),
        ("3 +full selection", v3, [q, dbt, sq]),
        ("4 +window gather ", v4, [q, dbt, sq, data]),
        ("5 full certified ", v5, [q, dbt, data, valid, sq]),
        ("6 full margin    ", v6, [q, dbt, data, valid, sq]),
    ]:
        t, ts = med(fn, args)
        print(f"{name}: {t*1e3:7.3f} ms = {B/t:9,.0f} QPS  runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
