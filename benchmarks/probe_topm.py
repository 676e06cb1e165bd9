"""Round-4 probe: A/B the per-tile top-m candidate-pool selection (the sweep
kernel's n_top epilogue) against the window-min selection it replaces, within
one process (session weather is +-10-15%; BASELINE.md).

Measures the certified DEFAULT serving config (bf16+resid sweep, f32 rescan,
cached prep threaded as args) at k in {10, 100, 1000} on gaussian 1M x 128.
Reports on-device ms/batch-128, QPS, the serving tier, and oracle recall.

Run on the real TPU:  python benchmarks/probe_topm.py [N_log2]
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


def med(fn, args, runs=5, iters=12):
    device_seconds_per_call(fn, args, iters=4)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def main():
    print(f"backend={jax.default_backend()} N={N} D={D} B={B}", flush=True)
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

    for k in (10, 100, 1000):
        i_or = np.argpartition(d_or, k, axis=1)[:, :k]
        prep = pkt.search_prep(
            B, dbt, data.dtype, valid, sq, k=k, metric="l2", live_prefix=N,
            sweep_err=err2, resid=resid, rscale=rscale, err1=err1,
        )
        pl, pdef = jtu.tree_flatten(prep)

        for name, topm in (("pool", True), ("wmin", False)):
            pkt.TOPM_ENABLE = topm

            def fn(qq, ddt, dd, vv, ss, se, rz, rs, e1, *pleaves,
                   _k=k, _pdef=pdef, _topm=topm):
                prev, pkt.TOPM_ENABLE = pkt.TOPM_ENABLE, _topm
                try:
                    return pkt.exact_knn_pallas_t(
                        qq, ddt, dd, vv, ss, k=_k, metric="l2", live_prefix=N,
                        sweep_err=se, resid=rz, rscale=rs, err1=e1,
                        prep=jtu.tree_unflatten(_pdef, pleaves),
                        report_tier=True,
                    )
                finally:
                    pkt.TOPM_ENABLE = prev

            args = [q, dbt, data, valid, sq, err2, resid, rscale, err1] + pl
            dists, idx, tier = fn(*args)
            idx = np.asarray(idx)
            hits = sum(len(set(idx[b].tolist()) & set(i_or[b].tolist()))
                       for b in range(B))
            rec = hits / (B * k)
            t, ts = med(fn, args)
            print(
                f"k={k:5d} {name}: {t*1e3:7.3f} ms = {B/t:9,.0f} QPS  tier={int(tier)}"
                f"  recall={rec:.4f}  runs={['%.2f' % (x*1e3) for x in ts]}",
                flush=True,
            )
    pkt.TOPM_ENABLE = True


if __name__ == "__main__":
    main()
