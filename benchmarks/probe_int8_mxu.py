"""Is the int8 sweep convert-bound or DMA-bound?  Three Pallas kernels over the
same int8 sweep mirror [Dp, cap]:

  A: convert int8->bf16 in-kernel + bf16 matmul (what _sweep_kernel does today)
  B: native int8 x int8 matmul, preferred_element_type=int32 (MXU int8 mode)
  C: stream-only (load + trivial reduce) — the pure DMA floor

bf16 reference: the production bf16 sweep at the same row count (2x the bytes).

Run: python benchmarks/probe_int8_mxu.py [N_log2=20]
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

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
D = 128
B = 128
T = pkt.SWEEP_TILE


def med(fn, args, runs=5, iters=24):
    device_seconds_per_call(fn, args, iters=4)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def mk_call(kernel, out_dtype, q_dtype):
    grid = (N // T, 1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), lambda di, qi: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, T), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, 128), lambda di, qi: (di, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // T, B, 128), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=pkt.VMEM_LIMIT),
        interpret=jax.default_backend() != "tpu",
    )


def kA(q_ref, db_ref, out_ref):  # convert + bf16 matmul (today's int8 path)
    db = db_ref[:].astype(jnp.bfloat16)
    dots = jax.lax.dot_general(q_ref[:], db, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    acc = dots[:, 0:128]
    for r in range(1, 32):
        acc = jnp.minimum(acc, dots[:, r * 128:(r + 1) * 128])
    out_ref[0] = acc


def kB(q_ref, db_ref, out_ref):  # native int8 matmul, int32 accumulation
    dots = jax.lax.dot_general(q_ref[:], db_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    acc = dots[:, 0:128]
    for r in range(1, 32):
        acc = jnp.minimum(acc, dots[:, r * 128:(r + 1) * 128])
    out_ref[0] = acc


def kC(q_ref, db_ref, out_ref):  # stream-only floor: one add per 32-lane group
    db = db_ref[:]
    acc = db[0:32, 0:128].astype(jnp.int32)[0:1]
    s = jnp.broadcast_to(acc, (B, 128))
    for r in range(1, 32):
        s = s + db[0:1, r * 128:(r + 1) * 128].astype(jnp.int32)
    out_ref[0] = s


def main():
    print(f"backend={jax.default_backend()} N={N} B={B}", flush=True)
    rng = np.random.default_rng(42)
    data = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32))
    z8, s8, e8 = pkt.quantize_int8(data)                      # [D, N] int8
    dbt_bf = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)    # [D, N] bf16
    qf = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
    q_bf = qf.astype(jnp.bfloat16)
    q_i8 = jnp.clip(jnp.round(qf * 16.0), -127, 127).astype(jnp.int8)

    callA = mk_call(kA, jnp.float32, jnp.bfloat16)
    callB = mk_call(kB, jnp.int32, jnp.int8)
    callC = mk_call(kC, jnp.int32, jnp.int8)

    # B (native int8 matmul) REJECTED by Mosaic: "acc is int in mixed matmul.
    # Expected float" — this Mosaic has no int8xint8->int32 MXU path; documented
    # in BASELINE's int8 assessment.  C's broadcast tricks also don't lower.
    for name, call, q, db, nbytes in [
        ("A convert+bf16mm", callA, q_bf, z8, N * D),
    ]:
        def fn(qq, dd, _call=call):
            return _call(qq, dd)

        t, ts = med(jax.jit(fn), [q, db])
        print(f"{name}: {t*1e3:7.3f} ms ({nbytes/t/1e9:6.0f} GB/s of codes)  "
              f"runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)

    # bf16 production reference at the same rows (2x bytes)
    bias = pkt.sweep_rows_1d(jnp.zeros((N,), jnp.float32)).reshape(1, N)

    def ref(qq, ddt, br):
        return pkt._window_mins(qq.astype(jnp.bfloat16), None, ddt, None, None,
                                None, br, q_tile=B, g=1, transposed=True)

    t, ts = med(jax.jit(ref), [qf, dbt_bf, bias])
    print(f"R bf16 sweep ref : {t*1e3:7.3f} ms ({2*N*D/t/1e9:6.0f} GB/s)  "
          f"runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)

    # production int8 phase-1 (scale + bias streams, transposed out) SAME session
    s8_row = pkt.sweep_rows_1d(s8).reshape(1, N)

    def prod8(qq, dd, sr, br):
        return pkt._window_mins(qq.astype(jnp.bfloat16), None, dd, None, None,
                                sr, br, q_tile=B, g=1, transposed=True)

    t, ts = med(jax.jit(prod8), [qf, z8, s8_row, bias])
    print(f"P prod int8 sweep: {t*1e3:7.3f} ms ({N*D/t/1e9:6.0f} GB/s of codes)  "
          f"runs={['%.2f'%(x*1e3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
