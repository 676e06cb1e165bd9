"""Wall-clock COMPILE time of the light certified k=10 program, containment
on vs off — bisects the round-5 bench stall (the first light-k=10 compile ran
past 9.5 min where round-4 programs compiled in ~2-4).

Run on the real TPU:  python benchmarks/probe_compile_time.py [contain=1] [N_log2=20]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

sys.path.insert(0, ".")

from mlvectordb_tpu.ops import pallas_knn_t as pkt  # noqa: E402

CONTAIN = (sys.argv[1] if len(sys.argv) > 1 else "1") != "0"
N = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 20)
D, B, K = 128, 128, 10


def main():
    pkt.CONTAIN_ENABLE = CONTAIN
    print(f"backend={jax.default_backend()} N={N} k={K} contain={CONTAIN}", flush=True)
    rng = np.random.default_rng(42)
    data = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32))
    sq = jnp.sum(data * data, axis=-1)
    valid = jnp.ones((N,), jnp.bool_)
    q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
    dbt = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)
    resid, rscale, err2, err1 = pkt.quantize_resid(data)
    prep = pkt.search_prep(
        B, dbt, data.dtype, valid, sq, k=K, metric="l2", live_prefix=N,
        light=True, sweep_err=err2, resid=resid, rscale=rscale, err1=err1,
    )
    t0 = time.perf_counter()
    d, i, tier = pkt.exact_knn_pallas_t(
        q, dbt, data, valid, sq, k=K, metric="l2", live_prefix=N,
        sweep_err=err2, resid=resid, rscale=rscale, err1=err1, light=True,
        prep=prep, report_tier=True,
    )
    jax.block_until_ready(d)
    print(f"compile+first-run: {time.perf_counter()-t0:.1f} s  tier={int(tier)}",
          flush=True)


if __name__ == "__main__":
    main()
