"""Bisect the round-5 k=1000 regression: the m=18 pool engagement (0b76c16)
measured 22.1 ms fused where round-4's wmin path measured ~11.8.

Measures, one process: phase-1-only at m in {0, 16, 18} (epilogue cost), the
fused pool path (TOPM on), and the fused wmin path (TOPM off).

Run on the real TPU:  python benchmarks/probe_k1000_bisect2.py [N_log2=20] [k=1000]
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
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1000


def med(fn, args, runs=5, iters=8):
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

    r1 = pkt._pick_r1(B, N, K)
    g = pkt.R1MAX // r1
    print(f"r1={r1} g={g} nt={N // pkt.SWEEP_TILE}", flush=True)

    bias_row = pkt.sweep_rows_1d(sq).reshape(1, N)
    rs_row = pkt.sweep_rows_1d(rscale).reshape(1, N)

    def make_p1(n_top, skip):
        def p1(qq, ddt, rz, rsr, br):
            qh = (-2.0 * qq).astype(jnp.bfloat16)
            qres = ((-2.0 * qq) - qh.astype(jnp.float32)).astype(jnp.bfloat16)
            out = pkt._window_mins(
                qh, qres, ddt, rz, rsr, None, br, q_tile=B, g=g,
                transposed=True, emit_topm=n_top, skip_wm=skip,
            )
            return out[0] if (n_top and not skip) else out
        return p1

    for n_top, skip in ((0, False), (16, False), (18, False), (18, True)):
        t, ts = med(make_p1(n_top, skip), [q, dbt, resid, rs_row, bias_row])
        print(f"phase1 m={n_top:2d} skip_wm={int(skip)}: {t*1e3:7.3f} ms  "
              f"runs={['%.2f' % (x*1e3) for x in ts]}", flush=True)

    prep = pkt.search_prep(
        B, dbt, data.dtype, valid, sq, k=K, metric="l2", live_prefix=N,
        sweep_err=err2, resid=resid, rscale=rscale, err1=err1,
    )
    pl, pdef = jtu.tree_flatten(prep)

    for name, topm in (("wmin", False), ("pool", True)):
        def fn(qq, ddt, dd, vv, ss, se, rz, rs, e1, *pleaves, _t=topm):
            s = pkt.TOPM_ENABLE
            pkt.TOPM_ENABLE = _t
            try:
                return pkt.exact_knn_pallas_t(
                    qq, ddt, dd, vv, ss, k=K, metric="l2", live_prefix=N,
                    sweep_err=se, resid=rz, rscale=rs, err1=e1,
                    prep=jtu.tree_unflatten(pdef, pleaves), report_tier=True,
                )
            finally:
                pkt.TOPM_ENABLE = s

        args = [q, dbt, data, valid, sq, err2, resid, rscale, err1] + pl
        _, _, tier = fn(*args)
        t, ts = med(fn, args)
        print(f"fused {name}: {t*1e3:7.3f} ms = {B/t:9,.0f} QPS  tier={int(tier)}  "
              f"runs={['%.2f' % (x*1e3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
