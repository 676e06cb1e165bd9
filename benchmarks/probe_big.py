"""Round-4 probe: large-k and DEEP-10M-shape targets (VERDICT r3 #3).

Measures the sort-based large-k selection and the same-dtype bf16 DEEP path:
  * 1M x 128 f32-store/bf16-sweep, l2 k=1000, certified (resid) + margin
  * 2^23 x 128 bf16-store/bf16-sweep (DEEP-10M config), cosine k=10, certified

Run on the real TPU:  python benchmarks/probe_big.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.timing import device_seconds_per_call  # noqa: E402
from mlvectordb_tpu.ops.pallas_knn_t import (  # noqa: E402
    exact_knn_pallas_t,
    quantize_resid,
    to_sweep_layout,
)

B = 128
D = 128


def run(tag, fn, args, iters=6):
    t0 = time.perf_counter()
    np.asarray(fn(*args)[0, 0])
    compile_s = time.perf_counter() - t0
    sec = device_seconds_per_call(fn, args, iters=iters)
    print(f"{tag:42s} {sec*1e3:9.3f} ms/batch {B/sec:9.0f} QPS "
          f"(first-call {compile_s:5.1f} s)", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(7)

    # ---- k=1000 on the mixed certified config ------------------------------------
    N = 1 << 20
    data = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    sq = jnp.sum(data * data, axis=-1)
    data_t = to_sweep_layout(data, dtype=jnp.bfloat16)
    resid, rscale, e2, e1 = quantize_resid(data)
    valid = jnp.ones((N,), jnp.bool_)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    jax.block_until_ready((data, sq, data_t, resid))

    def k1000_cert(qq, dt, da, va, ss, se, rz, rs, re1):
        d, i = exact_knn_pallas_t(qq, dt, da, va, ss, k=1000, metric="l2",
                                  live_prefix=N, sweep_err=se, resid=rz,
                                  rscale=rs, err1=re1)
        return d

    def k1000_margin(qq, dt, da, va, ss):
        d, i = exact_knn_pallas_t(qq, dt, da, va, ss, k=1000, metric="l2",
                                  live_prefix=N, certify=False)
        return d

    run("k=1000 1M certified(resid)", k1000_cert,
        [q, data_t, data, valid, sq, e2, resid, rscale, e1])
    run("k=1000 1M margin", k1000_margin, [q, data_t, data, valid, sq])

    # free before the DEEP allocation
    del data, sq, data_t, resid, rscale, e2, e1

    # ---- DEEP-10M shape: bf16 store + bf16 sweep (same dtype), cosine k=10 -------
    N2 = 1 << 23
    chunks = [rng.standard_normal((1 << 20, D)).astype(np.float32) for _ in range(8)]
    d16 = jnp.concatenate([jnp.asarray(c, jnp.bfloat16) for c in chunks])
    del chunks
    sq2 = jnp.sum(d16.astype(jnp.float32) * d16.astype(jnp.float32), axis=-1)
    d16_t = to_sweep_layout(d16)  # same dtype: no representational error term
    valid2 = jnp.ones((N2,), jnp.bool_)
    jax.block_until_ready((d16, sq2, d16_t))

    def deep_cert(qq, dt, da, va, ss):
        d, i = exact_knn_pallas_t(qq, dt, da, va, ss, k=10, metric="cosine",
                                  live_prefix=N2)
        return d

    run("DEEP 2^23 bf16 cosine k=10 certified", deep_cert,
        [q, d16_t, d16, valid2, sq2])

    # and k=100 at DEEP scale (the falloff VERDICT r2 flagged)
    def deep_k100(qq, dt, da, va, ss):
        d, i = exact_knn_pallas_t(qq, dt, da, va, ss, k=100, metric="cosine",
                                  live_prefix=N2)
        return d

    run("DEEP 2^23 bf16 cosine k=100 certified", deep_k100,
        [q, d16_t, d16, valid2, sq2])


if __name__ == "__main__":
    main()
