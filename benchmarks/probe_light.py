"""Round-4 probe: adaptive certificate tiering — LIGHT single-pass certified program
vs HEAVY residual-corrected program, gaussian + clustered corpora, k=10/100.

Run: python benchmarks/probe_light.py [N_log2]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.datasets import synthesize_clustered  # noqa: E402
from benchmarks.timing import device_seconds_per_call  # noqa: E402
from mlvectordb_tpu.ops import pallas_knn_t as pkt  # noqa: E402

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
D = 128
B = 128


def med(fn, args, runs=7, iters=16):
    device_seconds_per_call(fn, args, iters=4)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def corpus(kind):
    if kind == "clustered":
        syn = synthesize_clustered(N, D, B, n_clusters=2000, within_scale=0.9,
                                   anisotropy=6.0)
        return syn["data"], syn["queries"]
    rng = np.random.default_rng(42)
    return (rng.standard_normal((N, D), dtype=np.float32),
            rng.standard_normal((B, D), dtype=np.float32))


def main():
    print(f"backend={jax.default_backend()} N={N} B={B}", flush=True)
    for kind in ("gaussian", "clustered"):
        data_np, q_np = corpus(kind)
        data = jnp.asarray(data_np)
        sq = jnp.sum(data * data, axis=-1)
        valid = jnp.ones((N,), jnp.bool_)
        q = jnp.asarray(q_np)
        dbt = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)
        resid, rscale, e2, e1 = pkt.quantize_resid(data)

        sq_np = (data_np ** 2).sum(-1)
        for K in (10, 100):
            d_or = sq_np[None, :] - 2.0 * (q_np @ data_np.T) + (q_np ** 2).sum(-1)[:, None]
            i_or = np.argpartition(d_or, K, axis=1)[:, :K]
            for light in (True, False):
                def fn(qq, ddt, rescan, vv, ss, se, rz, rs, ee1, _k=K, _l=light):
                    return pkt.exact_knn_pallas_t(
                        qq, ddt, rescan, vv, ss, k=_k, metric="l2", live_prefix=N,
                        sweep_err=se, resid=rz, rscale=rs, err1=ee1,
                        light=_l, report_tier=True)
                args = [q, dbt, data, valid, sq, e2, resid, rscale, e1]
                dd, ii, tier = fn(*args)
                ii = np.asarray(ii)
                hits = sum(len(set(ii[b].tolist()) & set(i_or[b].tolist())) for b in range(B))
                rec = hits / (B * K)
                t, ts = med(fn, args)
                name = "light" if light else "heavy"
                print(f"{kind:9s} k={K:3d} {name}: {t*1e3:7.3f} ms = {B/t:9,.0f} QPS "
                      f"tier={int(tier)} recall={rec:.4f} runs={['%.2f'%(x*1e3) for x in ts]}",
                      flush=True)


if __name__ == "__main__":
    main()
