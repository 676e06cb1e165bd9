"""Attribute the sweep-only gap at DEEP shape: minimal kernel measured 2.95 ms but the
real path's sweep-only step measured 4.0 ms.  Hypothesis: the per-call query prep —
bias construction + sweep_rows_1d permutes of [cap] vectors (l2 sqn, cosine scale) —
costs ~1 ms at 8.4M rows and is QUERY-INDEPENDENT, so the store can cache the permuted
arrays and rebuild bias_row with one elementwise pass.

Run: python benchmarks/probe_qprep.py [N_log2=23]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.timing import device_seconds_per_call  # noqa: E402
from mlvectordb_tpu.ops import pallas_knn_t as pkt  # noqa: E402
from mlvectordb_tpu.ops.distances import MASKED  # noqa: E402

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 23)
D = 128
B = 128


def med(fn, args, runs=5, iters=8):
    device_seconds_per_call(fn, args, iters=3)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def main():
    print(f"backend={jax.default_backend()} N={N} B={B}", flush=True)
    rng = np.random.default_rng(42)
    data = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32)).astype(jnp.bfloat16)
    dbt = pkt.to_sweep_layout(data)
    sqn = jnp.sum(data.astype(jnp.float32) ** 2, axis=-1)
    q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
    hw = jnp.int32(N)

    g = 1

    # (a) the permute alone: sweep_rows_1d of one [N] f32 vector
    def perm(qq, ss):
        # depend on the carrier query so the loop body is not hoisted
        return pkt.sweep_rows_1d(ss + qq[0, 0]).reshape(1, N)[:, :8]

    # (b) full cosine qprep as _fused_t does it: maskadd, bias_row permute,
    #     scale permute, rsqrt — no kernel
    def qprep(qq, ss):
        q32 = qq.astype(jnp.float32)
        maskadd = jnp.where(jnp.arange(N) < hw, 0.0, MASKED)
        bias = maskadd + q32[0, 0] * 0  # cosine: bias = maskadd
        bias_row = pkt.sweep_rows_1d(bias).reshape(1, N)
        sfac = jax.lax.rsqrt(jnp.maximum(ss, 1e-30)) + q32[0, 0] * 0
        scale_row = pkt.sweep_rows_1d(sfac).reshape(1, N)
        return bias_row[:, :8] + scale_row[:, :8]

    # (c) kernel with PRECOMPUTED bias/scale rows (cached-store model)
    bias_pre = pkt.sweep_rows_1d(jnp.where(jnp.arange(N) < hw, 0.0, MASKED)).reshape(1, N)
    scale_pre = pkt.sweep_rows_1d(jax.lax.rsqrt(jnp.maximum(sqn, 1e-30))).reshape(1, N)

    def sweep_cached(qq, ddt, br, sr):
        qh = (-qq.astype(jnp.float32)).astype(jnp.bfloat16)
        wmin = pkt._window_mins(qh, None, ddt, None, None, sr, br, q_tile=B, g=g)
        return wmin[:, :8]

    # (d) kernel with INLINE qprep (what _fused_t does today)
    def sweep_inline(qq, ddt, ss):
        q32 = qq.astype(jnp.float32)
        maskadd = jnp.where(jnp.arange(N) < hw, 0.0, MASKED)
        bias_row = pkt.sweep_rows_1d(maskadd).reshape(1, N)
        sfac = jax.lax.rsqrt(jnp.maximum(ss, 1e-30))
        scale_row = pkt.sweep_rows_1d(sfac).reshape(1, N)
        qh = (-q32).astype(jnp.bfloat16)
        wmin = pkt._window_mins(qh, None, ddt, None, None, scale_row, bias_row,
                                q_tile=B, g=g)
        return wmin[:, :8]

    # (e) elementwise rebuild from cached PERMUTED pieces: rowid threshold + rsqrt
    rowid = pkt.sweep_rows_1d(jnp.arange(N, dtype=jnp.int32))
    sqn_sweep = pkt.sweep_rows_1d(sqn)

    def sweep_rebuild(qq, ddt, rid, sq_s):
        q32 = qq.astype(jnp.float32)
        bias_row = jnp.where(rid < hw, 0.0, MASKED).reshape(1, N)
        scale_row = jax.lax.rsqrt(jnp.maximum(sq_s, 1e-30)).reshape(1, N)
        qh = (-q32).astype(jnp.bfloat16)
        wmin = pkt._window_mins(qh, None, ddt, None, None, scale_row, bias_row,
                                q_tile=B, g=g)
        return wmin[:, :8]

    for name, fn, args in [
        ("a permute 1 vec    ", perm, [q, sqn]),
        ("b full qprep (cos) ", qprep, [q, sqn]),
        ("c sweep cached rows", sweep_cached, [q, dbt, bias_pre, scale_pre]),
        ("d sweep inline prep", sweep_inline, [q, dbt, sqn]),
        ("e sweep rebuilt    ", sweep_rebuild, [q, dbt, rowid, sqn_sweep]),
    ]:
        t, ts = med(fn, args)
        print(f"{name}: {t*1e3:7.3f} ms  runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
