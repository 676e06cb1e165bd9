"""The TRUE certificate tax: margin vs certified-light vs certified-heavy at k=10,
interleaved in ONE process (alternating measurement order, 6 rounds each) so relay
weather cancels.  Run: python benchmarks/probe_cert_tax.py [N_log2=20]
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
D, B, K = 128, 128, 10


def main():
    print(f"backend={jax.default_backend()} N={N} B={B} k={K}", flush=True)
    rng = np.random.default_rng(42)
    data = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32))
    sq = jnp.sum(data * data, axis=-1)
    valid = jnp.ones((N,), jnp.bool_)
    q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
    dbt = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)
    resid, rscale, err2, err1 = pkt.quantize_resid(data)

    def mk(certify, light):
        prep = pkt.search_prep(B, dbt, data.dtype, valid, sq, k=K, metric="l2",
                               live_prefix=N, certify=certify, light=light,
                               sweep_err=err2, resid=resid, rscale=rscale,
                               err1=err1)
        leaves, tdef = jtu.tree_flatten(prep)

        def fn(qq, ddt, dd, vv, ss, se, rz, rs, e1, *pl, _c=certify, _l=light,
               _t=tdef):
            return pkt.exact_knn_pallas_t(
                qq, ddt, dd, vv, ss, k=K, metric="l2", live_prefix=N,
                certify=_c, light=_l, sweep_err=se, resid=rz, rscale=rs,
                err1=e1, prep=jtu.tree_unflatten(_t, pl))

        return fn, [q, dbt, data, valid, sq, err2, resid, rscale, err1, *leaves]

    variants = [("margin", *mk(False, False)), ("cert-light", *mk(True, True)),
                ("cert-heavy", *mk(True, False))]
    for _, fn, args in variants:
        device_seconds_per_call(fn, args, iters=4)  # compile + warm
    results = {name: [] for name, _, _ in variants}
    for rnd in range(6):
        order = variants if rnd % 2 == 0 else variants[::-1]
        for name, fn, args in order:
            results[name].append(device_seconds_per_call(fn, args, iters=24))
    for name, _, _ in variants:
        ts = sorted(results[name])
        print(f"{name:10s}: med {ts[3]*1e3:6.3f} ms = {B/ts[3]:9,.0f} QPS  "
              f"runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
