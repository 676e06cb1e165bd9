"""Transposed-sweep exact kNN: the roofline kernel (round-2 redesign of pallas_knn).

Round-1's kernel (ops/pallas_knn.py) computes [db_tile, batch] distance blocks and was
measured VPU-BOUND at ~25% of HBM bandwidth: per tile it re-derived row norms from the
resident block (mul + lane reduction), applied the tail mask unconditionally, and
assembled full l2 distances — ~12 elementwise passes per [4096, 128] block vs ~1.2 us of
DMA.  This module reformulates phase 1 so the VPU does the minimum work that ordering
requires:

  * the database is swept TRANSPOSED: HBM layout [Dp, N], per-step block [Dp, T] so the
    MXU matmul is q_tile [Bt, Dp] @ dbt [Dp, T] -> [Bt, T] with the database axis on
    LANES.  Per-row quantities (sq_norms, liveness bias, 1/norm) then stream as
    CONTIGUOUS [1, T] row blocks — round 1 paid ~1 ms/sweep for the same data as a
    strided [T, 1] column, or burned VPU passes recomputing it in-register.
  * phase 1 ranks, it does not score: per-query constants (+|q|^2, *1/|q|) cannot change
    the ordering of windows within a query, so they are dropped; the metric's scalar
    factor (-2 for l2, -1 for ip/cosine) is folded into the query operand ON THE HOST.
    The per-element work collapses to dots*scale+bias with scale/bias statically elided
    per metric (l2 fast path: ONE add; ip fast path: zero VPU passes beyond window-min).
  * the unwritten-capacity tail mask runs under @pl.when only on the grid step that
    straddles the high-water mark — interior tiles skip it entirely.
  * window-min reduces over LANE slices (aligned multiples of 128), writing a [Bt, W]
    block; the full matrix [B, N/r1] feeds a selection identical in spirit to
    pallas_knn's but with no transposes anywhere.

Phase 2 (XLA) gathers candidate rows from a ROW-MAJOR array — pass the store's primary
f32 matrix as ``rescan_data`` and the sweep array can be a bf16 mirror: phase 1 then
moves half the bytes while candidate scoring stays exact f32 at HIGHEST precision
(bf16-sweep speed, f32-exact results, 1.5x HBM).

Exactness argument is unchanged from pallas_knn.py: a true top-k element's window can
only be dropped if >= s selected windows each contain a closer element (s >= k); the +16
margin absorbs phase-1 vs rescan rounding.  With a bf16 sweep the phase-1 ranking sees
bf16-rounded inputs — the bench recall gate (bench.py) and the oracle tests pin that the
margin holds on the target workloads; pure-f32 sweeps rank at HIGHEST precision.

Replaces the role of hnswlib's graph walk (reference:
src/mlvectordb/implementations/index.py:111) — same citation trail as ops/pallas_knn.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .distances import MASKED
from .pallas_knn import R2, VMEM_LIMIT, _pick_r1
from .topk import exact_knn

DB_TILE = 4096
Q_TILE = 256


def _phase1_precision(dtype):
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def _winmin_lanes(dist, r1):
    """Window-min over the database (LANE) axis: r1 aligned lane slices of W columns."""
    w = dist.shape[1] // r1
    acc = dist[:, :w]
    for r in range(1, r1):
        acc = jnp.minimum(acc, dist[:, r * w : (r + 1) * w])
    return acc


def _sweep_kernel(db_tile: int, r1: int, use_scale: bool, use_bias: bool, tail_mask: bool):
    """rank = dots [* scale_row] [+ bias_row], then window-min over lanes.

    scale_row/bias_row are [1, T] blocks of precomputed per-row data; either is elided
    at trace time when the metric doesn't need it.  tail_mask=True adds the high-water
    cutoff, applied ONLY on the straddling grid step.
    """

    def kernel(q_ref, db_ref, scale_ref, bias_ref, hw_ref, out_ref):
        dots = jax.lax.dot_general(
            q_ref[:],
            db_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_phase1_precision(db_ref.dtype),
            preferred_element_type=jnp.float32,
        )  # [Bt, T]
        rank = dots
        if use_scale:
            rank = rank * scale_ref[:]
        if use_bias:
            rank = rank + bias_ref[:]
        if tail_mask:
            di = pl.program_id(0)
            hw = hw_ref[0, 0]
            tile_end = (di + 1) * db_tile

            @pl.when(hw < tile_end)
            def _mask_tail():
                col = di * db_tile + jax.lax.broadcasted_iota(
                    jnp.int32, (1, db_tile), 1
                )
                out_ref[:] = _winmin_lanes(
                    jnp.where(col < hw, rank, float(MASKED)), r1
                )

            @pl.when(hw >= tile_end)
            def _no_mask():
                out_ref[:] = _winmin_lanes(rank, r1)
        else:
            out_ref[:] = _winmin_lanes(rank, r1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("q_tile", "db_tile", "r1", "use_scale", "use_bias", "tail_mask")
)
def _window_mins_t(qh, data_t, scale_row, bias_row, hw, *, q_tile, db_tile, r1,
                   use_scale, use_bias, tail_mask):
    """qh [B, Dp] (metric factor pre-folded), data_t [Dp, N] -> win-mins [B, N/r1]."""
    Dp, N = data_t.shape
    B = qh.shape[0]
    W = db_tile // r1
    # db outermost, q innermost: all q tiles run against a resident db tile, so the
    # database streams HBM->VMEM exactly once regardless of batch size
    grid = (N // db_tile, B // q_tile)
    return pl.pallas_call(
        _sweep_kernel(db_tile, r1, use_scale, use_bias, tail_mask),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, Dp), lambda di, qi: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, db_tile), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda di, qi: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((q_tile, W), lambda di, qi: (qi, di), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N // r1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * Dp,
            bytes_accessed=N * Dp * data_t.dtype.itemsize + B * (N // r1) * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(qh, data_t, scale_row, bias_row, hw)


@functools.partial(jax.jit, static_argnames=("k", "metric", "db_tile", "masked", "r1"))
def _select_and_rescan_t(q, qn_row, data, maskadd, hw, wmin, *, k, metric, db_tile, masked, r1):
    """Two-level window selection over [B, W1] phase-1 mins + exact HIGHEST rescan.

    Same exactness contract as pallas_knn._select_and_rescan; the [B, W1] orientation
    makes every gather a take_along_axis on the minor axis (no vmapped column walks).
    """
    B, W1 = wmin.shape
    s = min(min(2 * k, k + 16), W1)

    # Gather discipline (measured on v5e through the axon relay): elementwise gathers
    # on wide minor axes lower to ~11 ns/element — a flat take_along of 640 window
    # mins/query costs ~0.9 ms, dominating the whole search.  Everything below gathers
    # either CONTIGUOUS R2-wide blocks (6x cheaper), full 512B rows (DMA gather), or
    # tiny (<= s-wide) minors; candidate norms are recomputed in-register (tens of us)
    # rather than scalar-gathered from sq_norms (~0.45 ms).
    if W1 % R2 == 0 and W1 // R2 > 1:
        W2 = W1 // R2
        wmin3 = wmin.reshape(B, W2, R2)
        wmin2 = wmin3.min(axis=-1)                                  # [B, W2]
        s2 = min(min(2 * k, k + 16), W2)
        _, w2i = jax.lax.top_k(-wmin2, s2)                          # [B, s2]
        blocks = jnp.take_along_axis(wmin3, w2i[:, :, None], axis=1)  # [B, s2, R2]
        l1_vals = blocks.reshape(B, s2 * R2)
        s1 = min(s, s2 * R2)
        _, pos = jax.lax.top_k(-l1_vals, s1)                        # [B, s1]
        w2sel = jnp.take_along_axis(w2i, pos // R2, axis=1)         # tiny minor
        win = w2sel * R2 + pos % R2                                 # level-1 window ids
    else:
        s1 = min(s, W1)
        _, win = jax.lax.top_k(-wmin, s1)

    W = db_tile // r1
    base = (win // W) * db_tile + (win % W)
    rows = (base[:, :, None] + jnp.arange(r1)[None, None, :] * W).reshape(B, s1 * r1)

    sub = data[rows.reshape(-1)].astype(jnp.float32).reshape(B, s1 * r1, -1)
    dots = jax.lax.dot_general(
        q,
        sub,
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [B, s1*r1]
    sqn_c = jnp.sum(sub * sub, axis=-1)
    if metric == "l2":
        dist = jnp.maximum(qn_row + sqn_c - 2.0 * dots, 0.0)
    elif metric == "ip":
        dist = 1.0 - dots
    else:
        denom = jax.lax.rsqrt(jnp.maximum(qn_row * sqn_c, 1e-30))
        dist = 1.0 - dots * denom
    if masked:
        dist = dist + maskadd[rows]
    else:
        dist = jnp.where(rows < hw, dist, MASKED)

    kk = min(k, dist.shape[1])
    neg, p = jax.lax.top_k(-dist, kk)
    best_d = -neg
    best_i = jnp.take_along_axis(rows, p, axis=1).astype(jnp.int32)
    if kk < k:
        best_d = jnp.pad(best_d, ((0, 0), (0, k - kk)), constant_values=float(MASKED))
        best_i = jnp.pad(best_i, ((0, 0), (0, k - kk)))
    return best_d, best_i


def exact_knn_pallas_t(
    q: jax.Array,
    data_t: jax.Array,        # [Dp, N] sweep layout (bf16 mirror or f32)
    rescan_data: jax.Array,   # [N, Dp] row-major full-precision rows
    valid: jax.Array,
    sq_norms: jax.Array,
    *,
    k: int,
    metric: str,
    db_tile: int = DB_TILE,
    live_prefix: int | None = None,
    r1_override: int | None = None,
):
    """Transposed-sweep exact kNN; same results contract as ops.topk.exact_knn.

    Falls back to the row-major scan for shapes the fused path does not cover.
    """
    Dp, cap = data_t.shape
    B = q.shape[0]
    tile = db_tile if cap % db_tile == 0 else DB_TILE
    qt_w = min(Q_TILE, B)
    r1 = r1_override or _pick_r1(B, cap, k)
    if (
        cap < 2 * tile
        or cap % tile != 0
        or B % qt_w != 0
        or Dp % 128 != 0
        or k * r1 > cap
    ):
        return exact_knn(q, rescan_data, valid, sq_norms, k=k, metric=metric, db_tile=db_tile)

    q32 = q.astype(jnp.float32)
    qn_row = jnp.sum(q32 * q32, axis=-1)
    sqn_row = sq_norms.astype(jnp.float32).reshape(1, cap)
    zeros_row = jnp.zeros((1, cap), jnp.float32)

    masked = live_prefix is None
    if metric == "l2":
        qh = (-2.0 * q32).astype(data_t.dtype)
        use_scale = False
        scale_row = zeros_row
    elif metric == "ip":
        qh = (-q32).astype(data_t.dtype)
        use_scale = False
        scale_row = zeros_row
    else:  # cosine: rank by -dots/|d| (1/|q| is per-query constant, dropped)
        qh = (-q32).astype(data_t.dtype)
        use_scale = True
        scale_row = jax.lax.rsqrt(jnp.maximum(sqn_row, 1e-30))

    if not masked:
        bias_row = sqn_row if metric == "l2" else zeros_row
        use_bias = metric == "l2"
        hw = jnp.asarray([[live_prefix]], jnp.int32)
        wmin = _window_mins_t(
            qh, data_t, scale_row, bias_row, hw,
            q_tile=qt_w, db_tile=tile, r1=r1,
            use_scale=use_scale, use_bias=use_bias,
            tail_mask=live_prefix < cap,
        )
        return _select_and_rescan_t(
            q32, qn_row[:, None], rescan_data, sq_norms, jnp.int32(live_prefix), wmin,
            k=k, metric=metric, db_tile=tile, masked=False, r1=r1,
        )

    maskadd = jnp.where(valid, 0.0, MASKED).astype(jnp.float32)
    bias_row = (sqn_row + maskadd.reshape(1, cap)) if metric == "l2" else maskadd.reshape(1, cap)
    hw = jnp.asarray([[cap]], jnp.int32)
    wmin = _window_mins_t(
        qh, data_t, scale_row, bias_row, hw,
        q_tile=qt_w, db_tile=tile, r1=r1,
        use_scale=use_scale, use_bias=True, tail_mask=False,
    )
    return _select_and_rescan_t(
        q32, qn_row[:, None], rescan_data, maskadd, jnp.int32(cap), wmin,
        k=k, metric=metric, db_tile=tile, masked=True, r1=r1,
    )
