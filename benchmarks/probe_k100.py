"""Round-4 probe: k=100 certified tuning — sort-vs-top_k threshold and r1.

Each variant runs in THIS process (set MLVDB_SORT_TOPK_FROM before launch to probe
a different sort threshold; jit caches key on shapes, so thresholds need separate
processes).

Run:  python benchmarks/probe_k100.py [r1 ...]
      MLVDB_SORT_TOPK_FROM=64 python benchmarks/probe_k100.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.timing import device_seconds_per_call  # noqa: E402
from mlvectordb_tpu.ops import pallas_knn_t as pkt  # noqa: E402

B, D, N, K = 128, 128, 1 << 20, 100


def main():
    r1s = [int(a) for a in sys.argv[1:]] or [16, 32]
    print(f"backend: {jax.default_backend()}  SORT_TOPK_FROM={pkt.SORT_TOPK_FROM}",
          flush=True)
    rng = np.random.default_rng(7)
    data = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    sq = jnp.sum(data * data, axis=-1)
    data_t = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)
    resid, rscale, e2, e1 = pkt.quantize_resid(data)
    valid = jnp.ones((N,), jnp.bool_)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    jax.block_until_ready((data, sq, data_t, resid))

    for r1 in r1s:
        for mode in ("cert", "margin"):
            def fn(qq, dt, da, va, ss, se, rz, rs, re1, r1=r1, mode=mode):
                kw = (dict(sweep_err=se, resid=rz, rscale=rs, err1=re1)
                      if mode == "cert" else dict(certify=False))
                d, i = pkt.exact_knn_pallas_t(
                    qq, dt, da, va, ss, k=K, metric="l2", live_prefix=N,
                    r1_override=r1, **kw)
                return d

            args = [q, data_t, data, valid, sq, e2, resid, rscale, e1]
            t0 = time.perf_counter()
            np.asarray(fn(*args)[0, 0])
            c = time.perf_counter() - t0
            sec = device_seconds_per_call(fn, args, iters=8)
            print(f"k=100 r1={r1:2d} {mode:6s} {sec*1e3:8.3f} ms {B/sec:9.0f} QPS "
                  f"(first-call {c:5.1f} s)", flush=True)


if __name__ == "__main__":
    main()
