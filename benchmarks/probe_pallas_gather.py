"""A/B the Pallas DMA-pipelined gather-scoring kernel (ops/pallas_gather.py)
against the XLA gather + VPU mul-reduce form, standalone at k=1000 rescan
widths — plus the chained sweep->select->rescan in-situ form for both.

Run on the real TPU:  python benchmarks/probe_pallas_gather.py [N_log2=20] [k=1000] [sc=64]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.timing import device_seconds_per_call  # noqa: E402
from mlvectordb_tpu.ops import pallas_knn_t as pkt  # noqa: E402
from mlvectordb_tpu.ops.pallas_gather import gather_score  # noqa: E402

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
D = 128
B = 128
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
SC = int(sys.argv[3]) if len(sys.argv) > 3 else 64


def med(fn, args, runs=5, iters=8):
    device_seconds_per_call(fn, args, iters=2)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def main():
    print(f"backend={jax.default_backend()} N={N} B={B} k={K} sc={SC}", flush=True)
    rng = np.random.default_rng(42)
    data = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32))
    q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))

    r1 = pkt._pick_r1(B, N, K)
    s = min(2 * K, K + 16 + K // 8)
    P = N // r1
    s1p = -(-s // SC) * SC
    f_np = np.sort(rng.integers(0, P, size=(B, s1p)), axis=1).astype(np.int32)
    f0 = jnp.asarray(f_np)
    print(f"r1={r1} s1p={s1p} rows/q={s1p*r1}", flush=True)

    def dep(qq, ff):
        return ff + (qq[0, 0] != qq[0, 0]).astype(jnp.int32)

    def xla_form(qq, ff, dd):
        f = dep(qq, ff)
        dataw = dd.reshape(P, r1 * D)
        sub = dataw[f.reshape(-1)].reshape(B, s1p * r1, D)
        dots = jnp.sum(sub * qq[:, None, :], axis=-1)
        sqn_c = jnp.sum(sub * sub, axis=-1)
        return dots + sqn_c

    def pallas_form(qq, ff, dd):
        f = dep(qq, ff)
        dataw = dd.reshape(P, r1 * D)
        dots, sqn_c = gather_score(qq, dataw, f, r1=r1, sc=SC)
        return dots + sqn_c

    # correctness first
    a = np.asarray(jax.jit(xla_form)(q, f0, data))
    b = np.asarray(jax.jit(pallas_form)(q, f0, data))
    print("max |xla - pallas|:", float(np.abs(a - b).max()), flush=True)

    for name, fn in (("xla    standalone", xla_form), ("pallas standalone", pallas_form)):
        t, ts = med(jax.jit(fn), [q, f0, data])
        print(f"{name}: {t*1e3:7.3f} ms  runs={['%.2f' % (x*1e3) for x in ts]}",
              flush=True)


if __name__ == "__main__":
    main()
