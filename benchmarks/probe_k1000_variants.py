"""k=1000 end-to-end variants at 1M x 128 l2 batch-128 (target >= 15K QPS = 8.5 ms).

Round-4 bisect attribution (probe_k1000_bisect): L2 sort +1.8 ms, L1 chunked topk
+3.3 ms, window gather +5.3 ms (~57 GB/s, UNSORTED f), rescan+final ~0.4 ms.

Variants (margin-mode pipeline; certified measured ~equal):
  base        : today's path
  sortf       : gather windows in sorted-position order (locality; order is free —
                rows/dists/final topk all derive from f)
  sortf+ch512 : + _topk_spec chunk size 512 (kc 46 vs 111: ~2.3x less topk work)
  sortf+s1016 : + selection width k+16 (margin width) instead of k+16+k//8
  r1=2 combo  : narrowest windows halve gather bytes (s*r1*Dp*4)

Run: python benchmarks/probe_k1000_variants.py [N_log2=20]
"""

from __future__ import annotations

import math
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


def med(fn, args, runs=5, iters=6):
    device_seconds_per_call(fn, args, iters=2)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def topk_spec_ch(x, kk, ch):
    """_topk_spec with a parameterized chunk size."""
    B_, W = x.shape
    if W <= max(kk, 2 * ch):
        v, i = pkt._topk_min(x, min(kk, W))
        return v, i
    Wp = -(-W // ch) * ch
    pad = Wp - W
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=jnp.inf)
    nch = Wp // ch
    occupancy = kk // nch + 4 * math.isqrt(max(kk // nch, 1)) + 16
    guarantee = (kk + pad + nch - 1) // nch
    kc = min(ch, max(occupancy, guarantee))
    v, i = jax.lax.top_k(-x.reshape(B_ * nch, ch), kc)
    vch = (-v).reshape(B_, nch, kc)
    iglob = (
        i.reshape(B_, nch, kc) + (jnp.arange(nch, dtype=jnp.int32) * ch)[None, :, None]
    ).reshape(B_, nch * kc)
    v2, p = pkt._topk_min(vch.reshape(B_, nch * kc), kk)
    idx = jnp.minimum(jnp.take_along_axis(iglob, p, axis=1), W - 1)
    return v2, idx


def run_variant(q, dbt, data, sq, *, r1, s, ch, sortf):
    g = pkt.R1MAX // r1
    P = N // r1
    W2 = P // pkt.R2
    s2 = min(s, W2)

    q32 = q.astype(jnp.float32)
    qn_row = jnp.sum(q32 * q32, axis=-1)[:, None]
    bias_row = pkt.sweep_rows_1d(sq).reshape(1, N)
    q_fold = -2.0 * q32
    qh = q_fold.astype(jnp.bfloat16)
    qres = (q_fold - qh.astype(jnp.float32)).astype(jnp.bfloat16)
    wmin = pkt._window_mins(qh, qres, dbt, None, None, None, bias_row, q_tile=B, g=g)

    wmin3 = wmin.reshape(B, W2, pkt.R2)
    wmin2 = wmin3.min(axis=-1)
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
    v1_, pos = topk_spec_ch(l1_blk.reshape(B, s2 * pkt.R2), s1, ch)
    w2sel = jnp.take_along_axis(w2i, pos // pkt.R2, axis=1)
    p = w2sel * pkt.R2 + pos % pkt.R2
    f = pkt._pos_to_window(p, g)
    if sortf:
        f = jnp.sort(f, axis=1)

    dataw = data.reshape(N // r1, r1 * D)
    sub = dataw[f.reshape(-1)].reshape(B, s1 * r1, D).astype(jnp.float32)
    rows = (f[:, :, None] * r1 + jnp.arange(r1, dtype=jnp.int32)).reshape(B, s1 * r1)
    dots = jax.lax.dot_general(
        q32, sub, dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    sqn_c = jnp.sum(sub * sub, axis=-1)
    dist = jnp.maximum(qn_row + sqn_c - 2.0 * dots, 0.0)
    best_d, pk = pkt._topk_min(dist, K)
    best_i = jnp.take_along_axis(rows, pk, axis=1).astype(jnp.int32)
    return best_d, best_i


def main():
    print(f"backend={jax.default_backend()} N={N} B={B} k={K}", flush=True)
    rng = np.random.default_rng(42)
    data = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32))
    sq = jnp.sum(data * data, axis=-1)
    q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
    dbt = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)

    # oracle for recall
    d_np = np.asarray(sq)[None, :] - 2.0 * (np.asarray(q) @ np.asarray(data).T)
    want = np.argsort(d_np, axis=1)[:, :K]

    variants = [
        ("base (r1=4)        ", dict(r1=4, s=K + 16 + K // 8, ch=2048, sortf=False)),
        ("sortf              ", dict(r1=4, s=K + 16 + K // 8, ch=2048, sortf=True)),
        ("sortf+ch512        ", dict(r1=4, s=K + 16 + K // 8, ch=512, sortf=True)),
        ("sortf+ch512+s=k+16 ", dict(r1=4, s=K + 16, ch=512, sortf=True)),
        ("r1=2 sortf ch512   ", dict(r1=2, s=K + 16, ch=512, sortf=True)),
        ("r1=8 sortf ch512   ", dict(r1=8, s=K + 16, ch=512, sortf=True)),
    ]
    for name, kw in variants:
        fn = jax.jit(lambda qq, ddt, dd, ss, kw=kw: run_variant(qq, ddt, dd, ss, **kw))
        _, gi = fn(q, dbt, data, sq)
        gi = np.asarray(gi)
        rec = np.mean([len(set(gi[b]) & set(want[b])) / K for b in range(B)])
        t, ts = med(fn, [q, dbt, data, sq])
        print(f"{name}: {t*1e3:7.3f} ms = {B/t:8,.0f} QPS  recall={rec:.4f}  "
              f"runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
