"""Measure the certified paths after the IN-KERNEL optimistic-bound fold
(_sweep_kernel n_eb): margin vs cert-light vs cert-heavy at several k, in ONE
process so relay weather cancels.  Margin mode is byte-identical to the
pre-fold code, so it doubles as the in-process control against the recorded
pre-fold numbers (BASELINE.md round-4 matrix).

Also reports which certificate tier served each variant (one eager
report_tier call) — the fold's per-row bounds are TIGHTER than the old
per-window-max bounds, so tier-1 should certify at least as often.

Run: python benchmarks/probe_cert_fold.py [corpus=gauss|clustered] [N_log2=20] [k,k,...]
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

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "gauss"
N = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 20)
KS = [int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3 else [10, 1000]
D, B = 128, 128
TIERS = {0: "fast", 1: "widened", 2: "exact_scan", -1: "disengaged"}


def make_corpus():
    if CORPUS == "clustered":
        from benchmarks.datasets import synthesize_clustered

        # the SIFT-1M-synthetic fallback's exact parameters (datasets.load_sift1m),
        # so certified numbers here compare against the suite's rows
        syn = synthesize_clustered(
            N, D, B, n_clusters=2000, within_scale=0.9, anisotropy=6.0
        )
        return syn["data"], syn["queries"][:B]
    rng = np.random.default_rng(42)
    return (rng.standard_normal((N, D), dtype=np.float32),
            rng.standard_normal((B, D), dtype=np.float32))


def main():
    print(f"backend={jax.default_backend()} corpus={CORPUS} N={N} B={B} ks={KS}",
          flush=True)
    data_np, q_np = make_corpus()
    data = jnp.asarray(data_np)
    sq = jnp.sum(data * data, axis=-1)
    valid = jnp.ones((N,), jnp.bool_)
    q = jnp.asarray(q_np)
    dbt = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)
    resid, rscale, err2, err1 = pkt.quantize_resid(data)

    def mk(k, certify, light):
        prep = pkt.search_prep(B, dbt, data.dtype, valid, sq, k=k, metric="l2",
                               live_prefix=N, certify=certify, light=light,
                               sweep_err=err2, resid=resid, rscale=rscale,
                               err1=err1)
        leaves, tdef = jtu.tree_flatten(prep)

        def fn(qq, ddt, dd, vv, ss, se, rz, rs, e1, *pl, _k=k, _c=certify,
               _l=light, _t=tdef):
            return pkt.exact_knn_pallas_t(
                qq, ddt, dd, vv, ss, k=_k, metric="l2", live_prefix=N,
                certify=_c, light=_l, sweep_err=se, resid=rz, rscale=rs,
                err1=e1, prep=jtu.tree_unflatten(_t, pl))

        return fn, [q, dbt, data, valid, sq, err2, resid, rscale, err1, *leaves]

    for k in KS:
        variants = [(f"k={k} margin    ", *mk(k, False, False)),
                    (f"k={k} cert-light", *mk(k, True, True)),
                    (f"k={k} cert-heavy", *mk(k, True, False))]
        # which tier serves? (eager, outside the harness)
        tier_of = {}
        for name, _, _ in variants:
            certify = "cert" in name
            light = "light" in name
            _, _, t = pkt.exact_knn_pallas_t(
                q, dbt, data, valid, sq, k=k, metric="l2", live_prefix=N,
                certify=certify, light=light, sweep_err=err2, resid=resid,
                rscale=rscale, err1=err1, report_tier=True)
            tier_of[name] = TIERS.get(int(t), "?")
        for _, fn, args in variants:
            device_seconds_per_call(fn, args, iters=4)  # compile + warm
        results = {name: [] for name, _, _ in variants}
        rounds, iters = (6, 24) if k <= 100 else (4, 8)
        for rnd in range(rounds):
            order = variants if rnd % 2 == 0 else variants[::-1]
            for name, fn, args in order:
                results[name].append(device_seconds_per_call(fn, args, iters=iters))
        for name, _, _ in variants:
            ts = sorted(results[name])
            t = ts[len(ts) // 2]
            print(f"{name}: med {t*1e3:7.3f} ms = {B/t:9,.0f} QPS  "
                  f"tier={tier_of[name]:10s} "
                  f"runs={['%.2f' % (x*1e3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
