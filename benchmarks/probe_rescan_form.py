"""Rescan formulation A/B at k=1000 widths: the in-situ gather+dot runs ~45 ns/row
where the isolated gather runs ~9 — suspect the batched dot_general fuses a layout
transpose into the gather.  Variants:

  V0 gather -> batched dot_general (production today)
  V1 gather -> optimization_barrier -> batched dot_general (force row-major mat.)
  V2 gather -> VPU mul+reduce dots + sqn in one fused pass (no MXU operand)
  V3 V2 + full dist + final top-k (what production would become)

Run: python benchmarks/probe_rescan_form.py [N_log2=20] [k=1000]
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
    q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))

    r1 = pkt._pick_r1(B, N, K)
    s = min(2 * K, K + 16)
    s1 = s
    P = N // r1
    # synthetic sorted window ids, fresh-ish per call via carrier dependence
    f_np = np.sort(rng.integers(0, P, size=(B, s1)), axis=1).astype(np.int32)
    f0 = jnp.asarray(f_np)
    print(f"r1={r1} rows/q={s1*r1} total_rows={B*s1*r1}", flush=True)

    def dep(qq, ff):  # tie ids to the carrier without changing them (NaN check)
        return ff + (qq[0, 0] != qq[0, 0]).astype(jnp.int32)

    def v0(qq, ff, dd):
        f = dep(qq, ff)
        dataw = dd.reshape(P, r1 * D)
        sub = dataw[f.reshape(-1)].reshape(B, s1 * r1, D)
        dots = jax.lax.dot_general(qq, sub, (((1,), (2,)), ((0,), (0,))),
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
        return dots

    def v1(qq, ff, dd):
        f = dep(qq, ff)
        dataw = dd.reshape(P, r1 * D)
        sub = dataw[f.reshape(-1)].reshape(B, s1 * r1, D)
        sub = jax.lax.optimization_barrier(sub)
        dots = jax.lax.dot_general(qq, sub, (((1,), (2,)), ((0,), (0,))),
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
        return dots

    def v2(qq, ff, dd):
        f = dep(qq, ff)
        dataw = dd.reshape(P, r1 * D)
        sub = dataw[f.reshape(-1)].reshape(B, s1 * r1, D)
        dots = jnp.sum(sub * qq[:, None, :], axis=-1)
        sqn_c = jnp.sum(sub * sub, axis=-1)
        return dots + sqn_c

    def v3(qq, ff, dd):
        f = dep(qq, ff)
        qn = jnp.sum(qq * qq, axis=-1)[:, None]
        dataw = dd.reshape(P, r1 * D)
        sub = dataw[f.reshape(-1)].reshape(B, s1 * r1, D)
        dots = jnp.sum(sub * qq[:, None, :], axis=-1)
        sqn_c = jnp.sum(sub * sub, axis=-1)
        dist = jnp.maximum(qn + sqn_c - 2.0 * dots, 0.0)
        return pkt._topk_min(dist, K)

    for name, fn in [("V0 dot_general   ", v0), ("V1 barrier+dot    ", v1),
                     ("V2 vpu mul-reduce ", v2), ("V3 v2+dist+topk   ", v3)]:
        t, ts = med(jax.jit(fn), [q, f0, data])
        print(f"{name}: {t*1e3:7.3f} ms  runs={['%.2f'%(x*1e3) for x in ts]}",
              flush=True)


if __name__ == "__main__":
    main()
