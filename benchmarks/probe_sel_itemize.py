"""Itemize the small-k selection+rescan tax stage by stage (margin pipeline, honest
barrier harness), on the tile-major transposed sweep layout the fused path uses.

Stages (each jitted standalone, q is the carrier):
  S0 phase-1 window mins (transposed)         [nt, B, out_w]
  S1 + block-min reduce + level-2 top_k + sort
  S2 + tile gather + L1 top_k -> window positions
  S3 + rescan gather + dot + final top-k      (= full margin path)

Run: python benchmarks/probe_sel_itemize.py [N_log2=20] [k=10]
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
R2A = int(sys.argv[3]) if len(sys.argv) > 3 else 0  # 0 = WLANE default
# sub-ms programs need a long chain for the differenced signal to clear relay noise
ITERS = 48 if N <= 1 << 21 else 12


def med(fn, args, runs=5, iters=ITERS):
    device_seconds_per_call(fn, args, iters=4)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def main():
    print(f"backend={jax.default_backend()} N={N} D={D} B={B} k={K} iters={ITERS}",
          flush=True)
    rng = np.random.default_rng(42)
    data_np = rng.standard_normal((N, D), dtype=np.float32)
    q_np = rng.standard_normal((B, D), dtype=np.float32)

    data = jnp.asarray(data_np)
    sq = jnp.sum(data * data, axis=-1)
    q = jnp.asarray(q_np)
    dbt = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)

    r1 = pkt._pick_r1(B, N, K)
    g = pkt.R1MAX // r1
    P = N // r1
    r2 = R2A or pkt.WLANE
    s = min(2 * K, K + 16)
    W2 = P // r2
    s2 = min(s, W2)
    nt = N // pkt.SWEEP_TILE
    out_w = g * pkt.WLANE
    gb = out_w // r2
    print(f"r1={r1} P={P} r2={r2} gb={gb} W2={W2} s={s} nt={nt}", flush=True)

    bias_row = pkt.sweep_rows_1d(sq).reshape(1, N)

    # big arrays ride as explicit args: closure capture bakes them into the HLO as
    # literals and the relay's remote-compile endpoint rejects the payload (413)
    def wmins(qq, ddt, br, dd):
        qh = (-2.0 * qq.astype(jnp.float32)).astype(jnp.bfloat16)
        return pkt._window_mins(qh, None, ddt, None, None, None, br,
                                q_tile=B, g=g, transposed=True)

    def sel_l2(qq, ddt, br, dd):
        wt = wmins(qq, ddt, br, dd)
        wmin2 = (wt.reshape(nt, B, gb, r2).min(axis=-1)
                 .transpose(1, 0, 2).reshape(B, W2))
        v2, w2i = pkt._topk_min(wmin2, s2)
        return v2, jnp.sort(w2i, axis=1)

    def sel_l1(qq, ddt, br, dd):
        wt = wmins(qq, ddt, br, dd)
        wmin2 = (wt.reshape(nt, B, gb, r2).min(axis=-1)
                 .transpose(1, 0, 2).reshape(B, W2))
        v2, w2i = pkt._topk_min(wmin2, s2)
        w2i = jnp.sort(w2i, axis=1)
        flat = wt.reshape(nt * B, out_w)
        gidx = (w2i // gb) * B + jnp.arange(B, dtype=w2i.dtype)[:, None]
        rows4 = flat[gidx.reshape(-1)].reshape(B, s2, gb, r2)
        if gb > 1:
            onehot = (jnp.arange(gb, dtype=jnp.int32)[None, None, :]
                      == (w2i % gb)[:, :, None])
            l1_blk = jnp.sum(jnp.where(onehot[..., None], rows4, 0.0), axis=2)
        else:
            l1_blk = rows4.reshape(B, s2, r2)
        s1 = min(s, s2 * r2)
        v1, pos, floor = pkt._topk_spec(l1_blk.reshape(B, s2 * r2), s1)
        w2sel = jnp.take_along_axis(w2i, pos // r2, axis=1)
        return v1, w2sel * r2 + pos % r2

    def full(qq, ddt, br, dd):
        wt = wmins(qq, ddt, br, dd)
        qq32 = qq.astype(jnp.float32)
        qn_row = jnp.sum(qq32 * qq32, axis=-1)[:, None]
        return pkt._select_and_rescan(
            qq32, qn_row, dd, None, jnp.int32(N), None,
            k=K, metric="l2", r1=r1, masked=False, s_sel=None, r2=r2, wmin_t=wt)

    stages = [("S0 phase1 ", wmins), ("S1 +L2sel ", sel_l2),
              ("S2 +L1sel ", sel_l1), ("S3 +rescan", full)]
    prev = 0.0
    for name, fn in stages:
        t, ts = med(jax.jit(fn), [q, dbt, bias_row, data])
        print(f"{name}: {t*1e3:7.3f} ms  (delta {1e3*(t-prev):+7.3f})  "
              f"runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)
        prev = t


if __name__ == "__main__":
    main()
