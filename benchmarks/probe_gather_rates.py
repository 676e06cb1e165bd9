"""True rescan-gather rates with the barrier-fixed timing harness (the round-3
gather numbers predate the fix and may have been loop-hoisted).

Gathers 146K random rows per call (128 queries x 1141 windows) from a 512 MB f32
table reshaped to row sizes 512 B / 1 KB / 2 KB / 4 KB, sorted and unsorted indices.

Run: python benchmarks/probe_gather_rates.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.timing import device_seconds_per_call  # noqa: E402

B, S = 128, 1141
NELEM = 1 << 27  # 512 MB f32


def med(fn, args, runs=5, iters=6):
    device_seconds_per_call(fn, args, iters=2)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def main():
    print(f"backend={jax.default_backend()} B={B} S={S} (rows/call={B*S})", flush=True)
    rng = np.random.default_rng(42)
    flat = jnp.asarray(rng.standard_normal((NELEM,), dtype=np.float32))
    cq = jnp.zeros((8,), jnp.float32)

    for row_bytes in (512, 1024, 2048, 4096):
        C = row_bytes // 4
        P = NELEM // C
        idx_un = jnp.asarray(rng.integers(0, P, size=(B, S)), dtype=jnp.int32)
        idx_so = jnp.sort(idx_un, axis=1)

        def g(c, idx, fl, C=C, P=P):
            idx = idx + (c[0] != c[0]).astype(jnp.int32)
            dw = fl.reshape(P, C)
            return jnp.sum(dw[idx.reshape(-1)].reshape(B, S, C), axis=(1, 2))

        gb = B * S * row_bytes / 1e9
        for tag, idx in (("unsorted", idx_un), ("sorted  ", idx_so)):
            t, ts = med(jax.jit(g), [cq, idx, flat])
            print(f"{row_bytes:4d}B {tag}: {t*1e3:7.3f} ms  {gb/t:6.1f} GB/s  "
                  f"{t/ (B*S) * 1e9:6.1f} ns/row  runs={['%.2f'%(x*1e3) for x in ts]}",
                  flush=True)


if __name__ == "__main__":
    main()
