"""Honest k<=16 pool-vs-block-min A/B — the round-4 probe_topm comparison was
confounded by the jit cache (trace-time globals; see _fused_t's tuning note),
so the "pool 1.61 vs wmin 1.48" numbers compared one program against itself.
With tuning a STATIC arg, each variant now compiles its own program.

  bm    block-min wmin selection (production default for k<=32, r1=32)
  pool  per-tile top-m candidate pool (m=8, g=1) via tuning topm_bm=True

Run on the real TPU:
  python benchmarks/probe_k10_pool.py [N_log2=20] [k=10]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

sys.path.insert(0, ".")

from benchmarks.timing import device_seconds_per_call  # noqa: E402
from mlvectordb_tpu.ops import pallas_knn_t as pkt  # noqa: E402

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
D = 128
B = 128
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def med(fn, args, runs=7, iters=12):
    device_seconds_per_call(fn, args, iters=4)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def main():
    print(f"backend={jax.default_backend()} N={N} D={D} B={B} k={K}", flush=True)
    rng = np.random.default_rng(42)
    data_np = rng.standard_normal((N, D), dtype=np.float32)
    q_np = rng.standard_normal((B, D), dtype=np.float32)
    data = jnp.asarray(data_np)
    sq = jnp.sum(data * data, axis=-1)
    valid = jnp.ones((N,), jnp.bool_)
    q = jnp.asarray(q_np)
    dbt = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)
    resid, rscale, err2, err1 = pkt.quantize_resid(data)

    sq_np = (data_np ** 2).sum(-1)
    d_or = sq_np[None, :] - 2.0 * (q_np @ data_np.T) + (q_np ** 2).sum(-1)[:, None]
    i_or = np.argpartition(d_or, K, axis=1)[:, :K]

    # LIGHT prep (the adaptive serving default on benign corpora)
    prep = pkt.search_prep(
        B, dbt, data.dtype, valid, sq, k=K, metric="l2", live_prefix=N,
        light=True, sweep_err=err2, resid=resid, rscale=rscale, err1=err1,
    )
    pl, pdef = jtu.tree_flatten(prep)

    for name, bm_pool in (("bm  ", False), ("pool", True)):
        def fn(qq, ddt, dd, vv, ss, se, rz, rs, e1, *pleaves, _p=bm_pool):
            s = pkt.TOPM_BM
            pkt.TOPM_BM = _p
            try:
                return pkt.exact_knn_pallas_t(
                    qq, ddt, dd, vv, ss, k=K, metric="l2", live_prefix=N,
                    sweep_err=se, resid=rz, rscale=rs, err1=e1, light=True,
                    prep=jtu.tree_unflatten(pdef, pleaves), report_tier=True,
                )
            finally:
                pkt.TOPM_BM = s

        args = [q, dbt, data, valid, sq, err2, resid, rscale, err1] + pl
        dists, idx, tier = fn(*args)
        idx = np.asarray(idx)
        hits = sum(len(set(idx[b].tolist()) & set(i_or[b].tolist())) for b in range(B))
        rec = hits / (B * K)
        t, ts = med(fn, args)
        print(f"{name}: {t*1e3:7.3f} ms = {B/t:9,.0f} QPS  tier={int(tier)}  "
              f"recall={rec:.4f}  runs={['%.2f' % (x*1e3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
