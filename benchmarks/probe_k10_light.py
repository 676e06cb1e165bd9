"""k=10 light-tier variants at 1M x 128 l2 batch-128 (VERDICT r3 #2 target: <= 0.6 ms
= >= 210K QPS, certified).

Attribution: sweep 256 MB bf16 ~0.32 ms; the rescan gather is s*r1 rows/query
(r1=32: 20*32*512B*128q = 42 MB).  Narrower windows cut gather bytes ~linearly while
the block-granularity optimistic bounds (round 4) keep selection cheap.  int8 primary
sweep halves phase-1 bytes again (128 MB): if the light certificate's wider int8 band
still certifies tier-0 on this corpus, it is the fastest *certified* config.

Run: python benchmarks/probe_k10_light.py [N_log2=20]
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
K = 10


def med(fn, args, runs=7, iters=10):
    device_seconds_per_call(fn, args, iters=3)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def main():
    print(f"backend={jax.default_backend()} N={N} B={B} k={K}", flush=True)
    rng = np.random.default_rng(42)
    data = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32))
    sq = jnp.sum(data * data, axis=-1)
    valid = jnp.ones((N,), jnp.bool_)
    q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
    dbt = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)
    serr = pkt.sweep_err_norms(data)
    zi, zs, zerr = pkt.quantize_int8(data)

    d_np = np.asarray(sq)[None, :] - 2.0 * (np.asarray(q) @ np.asarray(data).T)
    want = np.argsort(d_np, axis=1)[:, :K]

    def bench(name, fn, args):
        d, i, tier = fn(*args)
        gi = np.asarray(i)
        rec = np.mean([len(set(gi[b]) & set(want[b])) / K for b in range(B)])
        t, ts = med(fn, args)
        print(f"{name}: {t*1e3:7.3f} ms = {B/t:8,.0f} QPS  tier={int(tier)} "
              f"recall={rec:.4f}  runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)

    for r1 in (32, 16, 8):
        fn = jax.jit(lambda qq, ddt, dd, vv, ss, se, r1=r1: pkt.exact_knn_pallas_t(
            qq, ddt, dd, vv, ss, k=K, metric="l2", live_prefix=N, r1_override=r1,
            sweep_err=se, light=True, report_tier=True))
        bench(f"bf16 light r1={r1:2d}", fn, [q, dbt, data, valid, sq, serr])

    for r1 in (32, 16, 8):
        fn = jax.jit(lambda qq, ddt, dd, vv, ss, rs, se, r1=r1: pkt.exact_knn_pallas_t(
            qq, ddt, dd, vv, ss, k=K, metric="l2", live_prefix=N, r1_override=r1,
            rscale=rs, sweep_err=se, light=True, report_tier=True))
        bench(f"int8 light r1={r1:2d}", fn, [q, zi, data, valid, sq, zs, zerr])


if __name__ == "__main__":
    main()
