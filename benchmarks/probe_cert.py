"""Round-4 probe: certified vs margin throughput on clustered + gaussian corpora.

Measures the per-window certificate rework (ops/pallas_knn_t): which tier the
certified default lands on for the suite's SIFT-synthetic clustered corpus and the
benign gaussian corpus, at k=10/100, plus compile wall-times (warmup budget input).

Run on the real TPU:  python benchmarks/probe_cert.py [N_log2]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.datasets import synthesize_clustered  # noqa: E402
from benchmarks.timing import device_seconds_per_call  # noqa: E402
from mlvectordb_tpu.ops.pallas_knn_t import (  # noqa: E402
    exact_knn_pallas_t,
    sweep_err_norms,
    to_sweep_layout,
)

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
D = 128
B = 128


def corpus(kind: str):
    if kind == "clustered":
        syn = synthesize_clustered(
            N, D, B, n_clusters=2000, within_scale=0.9, anisotropy=6.0
        )
        return syn["data"], syn["queries"]
    rng = np.random.default_rng(0)
    data = rng.standard_normal((N, D)).astype(np.float32)
    q = data[rng.choice(N, B, replace=False)] + 0.05 * rng.standard_normal(
        (B, D)
    ).astype(np.float32)
    return data, q


def main():
    from mlvectordb_tpu.ops.pallas_knn_t import quantize_resid

    print("backend:", jax.default_backend(), flush=True)
    worklist = {
        "clustered": [(10, "margin"), (10, "cert+resid"), (10, "cert+err"),
                      (100, "margin"), (100, "cert+resid")],
        "gaussian": [(10, "cert+resid"), (100, "cert+resid"), (100, "cert+err")],
    }
    for kind in ("clustered", "gaussian"):
        data_np, q_np = corpus(kind)
        data = jnp.asarray(data_np)
        sq = jnp.sum(data * data, axis=-1)
        data_t = to_sweep_layout(data, dtype=jnp.bfloat16)
        serr = sweep_err_norms(data)
        resid, rscale, e2, e1 = quantize_resid(data)
        valid = jnp.ones((N,), jnp.bool_)
        q = jnp.asarray(q_np)
        jax.block_until_ready((data, sq, data_t, serr, resid, rscale, e2, e1))

        for k, mode in worklist[kind]:
            if True:
                kw = {
                    "margin": dict(certify=False),
                    "cert+err": dict(certify=True, use_err=True),
                    "cert+resid": dict(certify=True, use_resid=True),
                    "cert-noerr": dict(certify=True),
                }[mode]
                # big arrays MUST ride as harness args, never closures — closures
                # bake them into the HLO as literals and the relay's remote-compile
                # endpoint rejects the payload (benchmarks/timing.py docstring)
                def fn(qq, dt, da, va, sqn, se, rz, rs, re1, kw=kw, k=k):
                    use_r = kw.get("use_resid")
                    d, i = exact_knn_pallas_t(
                        qq, dt, da, va, sqn, k=k, metric="l2",
                        live_prefix=N, certify=kw["certify"],
                        sweep_err=se if (use_r or kw.get("use_err")) else None,
                        resid=rz if use_r else None,
                        rscale=rs if use_r else None,
                        err1=re1 if use_r else None,
                    )
                    return d

                args = [q, data_t, data, valid, sq,
                        e2 if kw.get("use_resid") else serr, resid, rscale, e1]
                t0 = time.perf_counter()
                np.asarray(fn(*args)[0, 0])
                compile_s = time.perf_counter() - t0
                sec = device_seconds_per_call(fn, args, iters=8)
                print(
                    f"{kind:9s} k={k:4d} {mode:10s} {sec*1e3:8.3f} ms/batch "
                    f"{B/sec:10.0f} QPS  (first-call {compile_s:6.1f} s)",
                    flush=True,
                )


if __name__ == "__main__":
    main()
