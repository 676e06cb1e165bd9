"""Round-4 probe: itemize the k=10 driver-config path (VERDICT r3 #2).

Target: driver k=10 <= 0.6 ms / batch-128 (>=210K QPS/chip) certified.
Measures, on gaussian 1M x 128 (the bench.py corpus):

  * phase-1 only (window-min sweep) for: bf16, bf16+resid (default), int8
  * full fused certified + margin for each variant
  * selection+rescan residual = fused - phase1

Run on the real TPU:  python benchmarks/probe_k10.py [N_log2] [k]
"""

from __future__ import annotations

import functools
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
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def med(fn, args, runs=5, iters=12):
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

    dbt_bf = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)
    resid, rscale, err2, err1 = pkt.quantize_resid(data)
    serr_bf = pkt.sweep_err_norms(data)
    z8, s8, e8 = pkt.quantize_int8(data)

    r1 = pkt._pick_r1(B, N, K)
    g = pkt.R1MAX // r1
    print(f"r1={r1}", flush=True)

    # ---- phase-1 only: jit the window-min sweep alone -------------------------
    def make_p1(use_resid, use_scale):
        @jax.jit
        def p1(qq, ddt, rz, rs_row, sc_row, bias_row):
            qh = (-2.0 * qq).astype(jnp.bfloat16)
            qres = ((-2.0 * qq) - qh.astype(jnp.float32)).astype(jnp.bfloat16)
            return pkt._window_mins(
                qh, qres, ddt, rz if use_resid else None,
                rs_row if use_resid else None,
                sc_row if use_scale else None, bias_row, q_tile=B, g=g,
            )
        return p1

    bias_row = pkt.sweep_rows_1d(sq).reshape(1, N)
    rs_row = pkt.sweep_rows_1d(rscale).reshape(1, N)
    s8_row = pkt.sweep_rows_1d(s8).reshape(1, N)

    for name, ddt, rz, ur, us, scrow in [
        ("bf16      ", dbt_bf, resid, False, False, rs_row),
        ("bf16+resid", dbt_bf, resid, True, False, rs_row),
        ("int8      ", z8, resid, False, True, s8_row),
        ("int8+resid", z8, resid, True, True, s8_row),
    ]:
        t, ts = med(make_p1(ur, us), [q, ddt, rz, rs_row, scrow, bias_row])
        gbs = (N * D * ddt.dtype.itemsize + (N * D if ur else 0)) / t / 1e9
        print(f"phase1 {name}: {t*1e3:7.3f} ms  ({gbs:6.0f} GB/s)  runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)

    # ---- full fused ------------------------------------------------------------
    from mlvectordb_tpu.ops.pallas_knn_t import quantize_int8_resid

    z1r, s1r, z2r, s2r, e2r, e1r = quantize_int8_resid(data)
    cases = {
        "bf16 margin     ": (dict(), dict(sweep_err=serr_bf), False, dbt_bf),
        "bf16 cert       ": (dict(), dict(sweep_err=serr_bf), True, dbt_bf),
        "bf16+resid cert ": (dict(), dict(sweep_err=err2, resid=resid, rscale=rscale, err1=err1), True, dbt_bf),
        "int8 margin     ": (dict(), dict(sweep_err=e8, rscale=s8), False, z8),
        "int8 cert e8band": (dict(), dict(sweep_err=e8, rscale=s8), True, z8),
        "int8+resid cert ": (dict(), dict(sweep_err=e2r, resid=z2r, rscale=s1r, err1=e1r, rscale2=s2r), True, z1r),
    }

    sq_np = (data_np ** 2).sum(-1)
    d_or = sq_np[None, :] - 2.0 * (q_np @ data_np.T) + (q_np ** 2).sum(-1)[:, None]
    i_or = np.argpartition(d_or, K, axis=1)[:, :K]

    for name, (_, kw, certify, ddt) in cases.items():
        keys = list(kw.keys())

        def fn(qq, dd, vv, ss, ddt_, *extra, _keys=tuple(keys), _c=certify):
            return pkt.exact_knn_pallas_t(
                qq, ddt_, dd, vv, ss, k=K, metric="l2", live_prefix=N,
                certify=_c, **dict(zip(_keys, extra)))

        args = [q, data, valid, sq, ddt] + [kw[k] for k in keys]
        dists, idx = fn(*args)
        idx = np.asarray(idx)
        hits = sum(len(set(idx[b].tolist()) & set(i_or[b].tolist())) for b in range(B))
        rec = hits / (B * K)
        t, ts = med(fn, args)
        print(f"fused {name}: {t*1e3:7.3f} ms = {B/t:9,.0f} QPS  recall={rec:.4f}  runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
