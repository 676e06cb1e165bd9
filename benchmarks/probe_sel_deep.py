"""Round-4 probe: stage-by-stage cost of the DEEP-shape k=10 path (2^23 bf16)."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.timing import device_seconds_per_call  # noqa: E402
from mlvectordb_tpu.ops import pallas_knn_t as pkt  # noqa: E402


B, D, K = 128, 128, 10
N = 1 << 23
R1 = 32
G = pkt.R1MAX // R1
P = N // R1
R2 = pkt.R2
W2 = P // R2
S = min(2 * K, K + 16)


def main():
    print(f"backend={jax.default_backend()} P={P} W2={W2} s={S}", flush=True)
    rng = np.random.default_rng(7)
    chunks = [rng.standard_normal((1 << 20, D)).astype(np.float32) for _ in range(8)]
    d16 = jnp.concatenate([jnp.asarray(c, jnp.bfloat16) for c in chunks])
    del chunks
    sq = jnp.sum(d16.astype(jnp.float32) * d16.astype(jnp.float32), axis=-1)
    data_t = pkt.to_sweep_layout(d16)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    srow = pkt.sweep_rows_1d(sq).reshape(1, N)
    valid = jnp.ones((N,), jnp.bool_)
    jax.block_until_ready((d16, sq, data_t, srow))

    def wmin_of(qq, ddt, sr):
        qf = -2.0 * qq
        qh = qf.astype(jnp.bfloat16)
        return pkt._window_mins(qh, None, ddt, None, None, None, sr,
                                q_tile=min(pkt.Q_TILE, B), g=G)

    def stage0(qq, ddt, sr):  # phase-1 only (1-pass)
        return wmin_of(qq, ddt, sr)

    def stageA(qq, ddt, sr):  # + blockmin + block top_k
        wmin = wmin_of(qq, ddt, sr)
        wmin3 = wmin.reshape(B, W2, R2)
        v2, w2i, fl2 = pkt._topk_spec(wmin3.min(-1), min(S, W2))
        return (v2.sum() + w2i.sum())[None]

    def stageSR(qq, ddt, sr, da):  # full _select_and_rescan on real wmin
        wmin = wmin_of(qq, ddt, sr)
        qn_row = jnp.sum(qq * qq, axis=-1)[:, None]
        d, i, th = pkt._select_and_rescan(
            qq, qn_row, da, sq * 0, jnp.int32(N), wmin,
            k=K, metric="l2", r1=R1, masked=False)
        return d

    def stageF(qq, ddt, da, vv, ss):  # full certified path
        d, i = pkt.exact_knn_pallas_t(qq, ddt, da, vv, ss, k=K, metric="l2",
                                      live_prefix=N)
        return d

    stages = [
        ("0 phase1 only", stage0, [q, data_t, srow]),
        ("A +blockmin+blocksel", stageA, [q, data_t, srow]),
        ("SR +full select_and_rescan", stageSR, [q, data_t, srow, d16]),
        ("F full certified", stageF, [q, data_t, d16, valid, sq]),
    ]
    for name, fn, args in stages:
        t0 = time.perf_counter()
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(fn(*args))[0]))[..., :1]
        c = time.perf_counter() - t0
        sec = device_seconds_per_call(fn, args, iters=6)
        print(f"{name:30s} {sec*1e3:8.3f} ms (first-call {c:5.1f} s)", flush=True)


if __name__ == "__main__":
    main()
