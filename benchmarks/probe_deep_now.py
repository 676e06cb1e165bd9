"""DEEP-shape end-to-end after round-4 kernel changes (prep cache + in-kernel block
mins): 8.4M x 128 same-dtype bf16, cosine, k=10, batch-128.  Target >= 35K QPS
(<= 3.66 ms/batch).

Run: python benchmarks/probe_deep_now.py [N_log2=23]
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


def med(fn, args, runs=7, iters=8):
    device_seconds_per_call(fn, args, iters=2)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def main():
    print(f"backend={jax.default_backend()} N={N} B={B} k={K} same-dtype bf16 cosine",
          flush=True)
    rng = np.random.default_rng(42)
    data = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32)).astype(jnp.bfloat16)
    sq = jnp.sum(data.astype(jnp.float32) ** 2, axis=-1)
    valid = jnp.ones((N,), jnp.bool_)
    q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
    dbt = pkt.to_sweep_layout(data)

    # explicit prep (search_prep): the snapshot cache only populates eagerly, so
    # the timing fori_loop must thread the prep arrays as args to measure the
    # cached-prep program eager serving dispatches
    import jax.tree_util as jtu

    prep_c = pkt.search_prep(B, dbt, data.dtype, valid, sq, k=K, metric="cosine",
                             live_prefix=N)
    pc_leaves, pc_def = jtu.tree_flatten(prep_c)
    prep_m = pkt.search_prep(B, dbt, data.dtype, valid, sq, k=K, metric="cosine",
                             live_prefix=N, certify=False)
    pm_leaves, pm_def = jtu.tree_flatten(prep_m)

    def run(qq, ddt, dd, vv, ss, *pl):
        return pkt.exact_knn_pallas_t(qq, ddt, dd, vv, ss, k=K, metric="cosine",
                                      live_prefix=N, report_tier=True,
                                      prep=jtu.tree_unflatten(pc_def, pl))

    d, i, tier = run(q, dbt, data, valid, sq, *pc_leaves)
    print(f"tier={int(tier)}", flush=True)
    t, ts = med(run, [q, dbt, data, valid, sq, *pc_leaves])
    print(f"DEEP cert+prep+blockmin: {t*1e3:7.3f} ms = {B/t:8,.0f} QPS  "
          f"runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)

    # margin mode for reference
    def run_m(qq, ddt, dd, vv, ss, *pl):
        return pkt.exact_knn_pallas_t(qq, ddt, dd, vv, ss, k=K, metric="cosine",
                                      live_prefix=N, certify=False,
                                      prep=jtu.tree_unflatten(pm_def, pl))

    t, ts = med(run_m, [q, dbt, data, valid, sq, *pm_leaves])
    print(f"DEEP margin+prep       : {t*1e3:7.3f} ms = {B/t:8,.0f} QPS  "
          f"runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
