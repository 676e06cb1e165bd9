"""Probe: window-min sweep output layout — [B, nt*ow] (row-strided 512 B writes per
tile) vs tile-major [nt, B, ow] (one contiguous 64 KB write per tile).

Hypothesis from the DEEP bisect: the strided write caps the sweep at ~530 GB/s
effective; tile-major should recover most of the 1.3 ms gap at 8.4M rows.

Run: python benchmarks/probe_out3d.py [N_log2=23]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from benchmarks.timing import device_seconds_per_call  # noqa: E402
from mlvectordb_tpu.ops import pallas_knn_t as pkt  # noqa: E402
from mlvectordb_tpu.ops.pallas_knn import VMEM_LIMIT  # noqa: E402

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 23)
D = 128
B = 128
ST = pkt.SWEEP_TILE


def med(fn, args, runs=5, iters=8):
    device_seconds_per_call(fn, args, iters=3)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def main():
    print(f"backend={jax.default_backend()} N={N} B={B}", flush=True)
    rng = np.random.default_rng(42)
    data = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32)).astype(jnp.bfloat16)
    dbt = pkt.to_sweep_layout(data)
    bias = jnp.zeros((1, N), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))

    g = 1
    ow = g * pkt.WLANE
    nt = N // ST
    kernel = pkt._sweep_kernel(g, False, False, False)

    def run2d(qq, ddt, bias_row):
        qh = (-qq).astype(jnp.bfloat16)
        grid = (nt, B // B)
        return pl.pallas_call(
            kernel, grid=grid,
            in_specs=[
                pl.BlockSpec((B, D), lambda di, qi: (qi, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, D), lambda di, qi: (qi, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, ST), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ST), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ST), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ST), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ST), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, ow), lambda di, qi: (qi, di), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nt * ow), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
            interpret=jax.default_backend() != "tpu",
        )(qh, qh, ddt, bias_row, bias_row, bias_row, bias_row)[:, :8]

    def run3d(qq, ddt, bias_row):
        qh = (-qq).astype(jnp.bfloat16)
        grid = (nt, B // B)

        def kernel3(q_ref, qr_ref, db_ref, r_ref, rs_ref, sc_ref, b_ref, out_ref):
            dots = jax.lax.dot_general(
                q_ref[:], db_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            rank = dots + b_ref[:]
            r1 = pkt.R1MAX
            acc = rank[:, :pkt.WLANE]
            for rr in range(1, r1):
                acc = jnp.minimum(acc, rank[:, rr * pkt.WLANE:(rr + 1) * pkt.WLANE])
            out_ref[0, :, :] = acc

        return pl.pallas_call(
            kernel3, grid=grid,
            in_specs=[
                pl.BlockSpec((B, D), lambda di, qi: (qi, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, D), lambda di, qi: (qi, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, ST), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ST), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ST), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ST), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ST), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, B, ow), lambda di, qi: (di, qi, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nt, B, ow), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
            interpret=jax.default_backend() != "tpu",
        )(qh, qh, ddt, bias_row, bias_row, bias_row, bias_row)[0, :, :8]

    # correctness cross-check on a small slice
    a = np.asarray(run2d(q, dbt, bias))
    b = np.asarray(run3d(q, dbt, bias))
    print("first-tile agreement:", np.allclose(a[:, :8], b, atol=1e-5), flush=True)

    for name, fn in [("2d strided", run2d), ("3d tile-major", run3d)]:
        t, ts = med(fn, [q, dbt, bias])
        gbs = (N * D * 2 + B * nt * ow * 4) / t / 1e9
        print(f"{name}: {t*1e3:7.3f} ms  ({gbs:6.0f} GB/s)  runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
