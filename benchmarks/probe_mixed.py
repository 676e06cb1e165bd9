"""Mixed-batch containment throughput (VERDICT r4 weak #4's acceptance bar):
1 adversarial + 127 benign queries vs 128 benign, certified k=10 at 1M.

The adversarial query plants more near-tie windows than tier-1's selection
width, so its certificate fails; the CONTAINED tier re-proves an 8-query
sub-batch at tier-2 width instead of dragging all 128 queries through tier 2.
Bar: poisoned-batch throughput >= 60% of all-benign.

Run on the real TPU:  python benchmarks/probe_mixed.py [N_log2=20] [k=10]
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
    data_np = rng.standard_normal((N, D)).astype(np.float32)
    qv = rng.standard_normal((D,)).astype(np.float32)
    r1 = pkt._pick_r1(B, N, K)
    s1w = min(2 * K, K + 16 + K // 8)
    # plant 3x the tier-1 width of near-ties, one per window, so the poisoned
    # query's kth found distance sits inside the unselected windows' bound band
    nplant = 3 * s1w
    for j in range(nplant):
        data_np[j * r1] = qv + rng.standard_normal(D).astype(np.float32) * 1e-4
    data = jnp.asarray(data_np)
    sq = jnp.sum(data * data, axis=-1)
    valid = jnp.ones((N,), jnp.bool_)
    dbt = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)
    resid, rscale, err2, err1 = pkt.quantize_resid(data)

    q_np = rng.standard_normal((B, D)).astype(np.float32)
    q_benign = jnp.asarray(q_np)
    q_mixed_np = q_np.copy()
    q_mixed_np[0] = qv
    q_mixed = jnp.asarray(q_mixed_np)

    prep = pkt.search_prep(
        B, dbt, data.dtype, valid, sq, k=K, metric="l2", live_prefix=N,
        light=True, sweep_err=err2, resid=resid, rscale=rscale, err1=err1,
    )
    pl, pdef = jtu.tree_flatten(prep)

    def fn(qq, ddt, dd, vv, ss, se, rz, rs, e1, *pleaves):
        return pkt.exact_knn_pallas_t(
            qq, ddt, dd, vv, ss, k=K, metric="l2", live_prefix=N,
            sweep_err=se, resid=rz, rscale=rs, err1=e1, light=True,
            prep=jtu.tree_unflatten(pdef, pleaves), report_tier=True,
        )

    base_args = [dbt, data, valid, sq, err2, resid, rscale, err1] + pl
    res = {}
    for name, qq in (("benign", q_benign), ("mixed ", q_mixed)):
        d, i, tier = fn(qq, *base_args)
        # exactness of the poisoned slot against the numpy oracle
        if name == "mixed ":
            dd0 = ((data_np - q_mixed_np[0]) ** 2).sum(-1)
            ior = set(np.argpartition(dd0, K)[:K].tolist())
            got = set(np.asarray(i)[0].tolist())
            print(f"poisoned-query exact: {got == ior}  tier={int(tier)}", flush=True)
        t, ts = med(fn, [qq] + base_args)
        res[name.strip()] = t
        print(f"{name}: {t*1e3:7.3f} ms = {B/t:9,.0f} QPS  tier={int(tier)}  "
              f"runs={['%.2f' % (x*1e3) for x in ts]}", flush=True)
    ratio = res["benign"] / res["mixed"]
    print(f"mixed/benign throughput ratio: {ratio:.2f}  "
          f"({'PASS' if ratio >= 0.6 else 'FAIL'} vs the 0.6 bar)", flush=True)


if __name__ == "__main__":
    main()
