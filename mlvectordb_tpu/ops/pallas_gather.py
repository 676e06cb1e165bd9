"""Pallas gather-scoring kernel: DMA-pipelined candidate-window rescan.

The k=1000 rescan gathers ~s1 contiguous windows (r1*Dp f32 rows) per query and
scores them.  As an XLA row gather the identical work measures ~1.8 ms
standalone but ~5.5 ms inside the full fused program — round-4 bisection showed
the slowdown is XLA SCHEDULING, not fusion (optimization_barrier changes
nothing; chunking the gather recovered 1.6 ms).  This kernel takes the gather
out of XLA's scheduler entirely: window ids ride in as scalar-prefetch
arguments, each grid step issues SC dynamic-row DMAs from HBM into a
double-buffered VMEM scratch (next chunk's copies start before this chunk's
compute), and the dot/norm reductions run on the MXU against a constant
group-sum matrix.

Returns raw ``(dots, sqn)`` per candidate row; the caller applies the metric
formula, masks and the final top-k — identical arithmetic to the XLA ``_score``
path in ops/pallas_knn_t._rescan_windows (f32 mul + tree-reduce, inside the
certificate's accumulation slack).

Replaces the hot half of what hnswlib's graph walk did in the reference
(src/mlvectordb/implementations/index.py:111) for the large-k band.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(SC: int, W: int, nch: int):
    def kernel(f_ref, qt_ref, dataw_ref, dots_ref, sqn_ref, buf, gmat_ref, sems):
        b = pl.program_id(0)
        c = pl.program_id(1)
        slot = jax.lax.rem(c, 2)
        nxt = jax.lax.rem(c + 1, 2)

        def start(chunk, into):
            for j in range(SC):
                pltpu.make_async_copy(
                    dataw_ref.at[f_ref[b, chunk * SC + j]],
                    buf.at[into, j],
                    sems.at[into, j],
                ).start()

        @pl.when(c == 0)
        def _():
            start(0, slot)

        @pl.when(c + 1 < nch)
        def _():
            start(c + 1, nxt)

        for j in range(SC):
            pltpu.make_async_copy(
                dataw_ref.at[f_ref[b, c * SC + j]],
                buf.at[slot, j],
                sems.at[slot, j],
            ).wait()

        rows = buf[slot]                                   # [SC, W]
        q = qt_ref[b]                                      # [W] (query tiled r1x)
        gm = gmat_ref[:]                                   # [W, 128] group one-hot
        # per-row-of-window reductions as ONE MXU matmul each: lane i of the
        # output is sum over the i-th Dp-lane group (i < r1; rest are zero)
        dots_ref[0, 0] = jax.lax.dot_general(
            rows * q[None, :], gm,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sqn_ref[0, 0] = jax.lax.dot_general(
            rows * rows, gm,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("r1", "sc"))
def gather_score(q32, dataw, f, *, r1: int, sc: int = 64):
    """(dots, sqn) [B, s1p*r1] f32 for candidate windows ``f`` [B, s1p] int32.

    ``dataw`` [P, r1*Dp] f32 row-major (one window per row); ``q32`` [B, Dp].
    ``s1p`` must be a multiple of ``sc``.  Row order of the flat outputs matches
    window-major candidate order: column j*r1 + i is row i of window f[:, j].
    """
    B, Dp = q32.shape
    P, W = dataw.shape
    assert W == r1 * Dp
    s1p = f.shape[1]
    assert s1p % sc == 0, (s1p, sc)
    nch = s1p // sc
    qt = jnp.tile(q32, (1, r1))                            # [B, W]
    # one-hot group matrix: element (w, i) = 1 iff lane w belongs to row i of
    # its window (w // Dp == i); lanes i >= r1 stay zero
    gm = (jnp.arange(W, dtype=jnp.int32)[:, None] // Dp
          == jnp.arange(128, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    # the constant group matrix rides as a whole-array VMEM input (64 KB at
    # r1=4), shared by every grid step
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nch),
        in_specs=[
            # whole [B, W] array resident in VMEM (256 KB at k=1000 shape): a
            # (1, W) per-b block would violate Mosaic's 8-sublane block rule
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((W, 128), lambda b, c, fr: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, sc, 128), lambda b, c, fr: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sc, 128), lambda b, c, fr: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, sc, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, sc)),
        ],
    )

    def kernel2(f_ref, qt_ref, dataw_ref, gmat_ref, dots_ref, sqn_ref, buf, sems):
        _kernel(sc, W, nch)(f_ref, qt_ref, dataw_ref, dots_ref, sqn_ref, buf,
                            gmat_ref, sems)

    dots4, sqn4 = pl.pallas_call(
        kernel2,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, nch, sc, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, nch, sc, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * s1p * sc * 0 + 4 * B * s1p * W,
            bytes_accessed=B * s1p * W * 4 + 2 * B * s1p * 128 * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(f, qt, dataw, gm)

    dots = dots4[..., :r1].reshape(B, s1p * r1)
    sqn = sqn4[..., :r1].reshape(B, s1p * r1)
    return dots, sqn
