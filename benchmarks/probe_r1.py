"""Round-4 probe: window width r1 at k=10/k=100 — the rescan gather moves ~160 GB/s
regardless of block size (bisect probe), so bytes = B*s1*r1*Dp*4 dominate phase 2 and
smaller windows may win despite the larger window-min matrix.

Run: python benchmarks/probe_r1.py [N_log2]
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


def med(fn, args, runs=5, iters=16):
    device_seconds_per_call(fn, args, iters=4)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def main():
    print(f"backend={jax.default_backend()} N={N} B={B}", flush=True)
    rng = np.random.default_rng(42)
    data_np = rng.standard_normal((N, D), dtype=np.float32)
    q_np = rng.standard_normal((B, D), dtype=np.float32)
    data = jnp.asarray(data_np)
    sq = jnp.sum(data * data, axis=-1)
    valid = jnp.ones((N,), jnp.bool_)
    q = jnp.asarray(q_np)
    dbt = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)
    serr = pkt.sweep_err_norms(data)

    for K in (10, 100):
        for r1 in (8, 16, 32):
            for cert in (False, True):
                def fn(qq, ddt, rescan, vv, ss, se, _r1=r1, _c=cert, _k=K):
                    return pkt.exact_knn_pallas_t(
                        qq, ddt, rescan, vv, ss, k=_k, metric="l2", live_prefix=N,
                        r1_override=_r1, sweep_err=se, certify=_c)
                t, ts = med(fn, [q, dbt, data, valid, sq, serr])
                print(f"k={K:4d} r1={r1:2d} cert={int(cert)}: {t*1e3:7.3f} ms = {B/t:9,.0f} QPS  runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
