"""Fused exact-kNN for TPU: Pallas distance+window-min kernel + hierarchical selection.

Replaces the reference's hnswlib C++ graph search (reference:
src/mlvectordb/implementations/index.py:91-129) with an exact two-phase algorithm designed
for the MXU/VPU/HBM balance of a TPU chip:

Phase 1 (Pallas kernel, the hot loop):
    grid over (database tiles, query tiles) — database outermost, so the whole database
    streams HBM->VMEM exactly ONCE regardless of batch size.  Each step computes one
    [T, Bt] distance block on the MXU directly in VMEM and reduces every R1-wide strided
    window of the database axis to its min on the VPU.  Only the [N/R1, B] window-min
    matrix is written to HBM — the [N, B] distance matrix never exists anywhere.  This is
    the memory shape of the blockwise/ring-attention trick applied to the database axis
    (SURVEY.md §5.7).

    Orientation: everything is computed TRANSPOSED ([db, batch] instead of [batch, db]) so
    the matmul is MXU-native with zero transposes: the database tile [T, D] is the LHS
    (contraction dim D minor) and q^T [D, Bt] is the RHS (batch minor).

    Two variants (a [T, 1] column input costs ~1 ms/sweep in strided DMA, so the common
    case avoids it entirely):
      * fast   — no per-row input at all: row norms are recomputed in-kernel from the
        resident tile (one VPU pass), and the unwritten capacity tail is masked
        arithmetically (row-index iota >= high-water scalar in SMEM).  Used when the
        namespace has no tombstones and the query has no filter.
      * masked — adds a [T, 1] bias column (l2: sq_norms + mask; ip/cosine: mask) carrying
        tombstone/filter masking; exact for any liveness pattern.

Phase 2 (XLA, small tensors):
    two-level window selection.  Level-2 mins (windows of R1*R2 rows) -> top-s level-2
    windows -> gather their level-1 mins -> top-s level-1 windows -> gather the s*R1
    candidate rows and compute exact distances at HIGHEST precision with the true liveness
    mask -> final top-k.

Exactness: if a true top-k element lived in a window that selection dropped, then >= s
selected windows each contain an element closer than it — contradiction with its rank
(s >= k).  We select with margin s = min(2k, k+16) so phase-1 rounding (window-min matmul)
can never demote a boundary window; tests assert set-equality with the f32 numpy oracle.

Window layout: window w covers rows (w // W)*T + (w % W) + r*W for r < R1, where
W = T/R1 lanes — strided within its tile because Mosaic reduces over sublane slices, not
reshapes.  Phase 2 inverts this mapping arithmetically.

Same signature/results contract as ops.topk.exact_knn; ops.backend picks this on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .distances import MASKED
from .topk import exact_knn

# database rows per level-1 window (W = DB_TILE/R1 lanes of output per tile).
# Adaptive: the window-min output costs ~2*N*B*4/r1 bytes of HBM traffic while the
# phase-2 rescan costs ~B*s*r1 row-gathers, so the optimum is r1* ~ sqrt(N / (256*s))
# with s = k+16 — which matches measurement on v5e (1M f32 k=10 B=128: r1=8 0.87 ms vs
# r1=32 2.5 ms; 8.4M bf16 k=10 B=128: r1=16 best; k=100 at 1M: r1=8 +75% QPS).  Small
# batches instead pin r1=32: narrow [N/r1, B] outputs are lane-padded, so B=8 with small
# r1 pays up to 16x write amplification (measured 1.1 ms vs 0.4 ms).
def _pick_r1(batch: int, n_rows: int, k: int) -> int:
    if batch <= 32:
        return 32
    opt = (n_rows / (256.0 * (k + 16))) ** 0.5
    for r1 in (8, 16, 32):
        if opt <= r1 * 1.5:
            return r1
    return 32
# level-1 windows per level-2 window
R2 = 32
# rows per phase-1 grid step along the database axis
DB_TILE = 4096
# query columns per grid step
Q_TILE = 256
# scoped VMEM budget (v5e has 128 MiB physical; default scoped limit is 16 MiB)
VMEM_LIMIT = 100 * 1024 * 1024


def _winmin(dist, r1):
    """Strided window-min over the database (sublane) axis: r1 static slices of W rows."""
    w = dist.shape[0] // r1
    acc = dist[:w, :]
    for r in range(1, r1):
        acc = jnp.minimum(acc, dist[r * w : (r + 1) * w, :])
    return acc


def _phase1_precision(dtype):
    """f32 storage ranks windows at HIGHEST so phase-1 mins track the HIGHEST-precision
    rescan to within accumulation-order noise — the fixed +16 selection margin is then a
    true bound, not a heuristic (a bf16-pass phase 1 could demote a boundary window on
    tightly clustered data).  bf16 storage is single-pass either way: the caller opted
    into reduced input precision explicitly, and phase 1/rescan see identical products."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def _fast_kernel(metric: str, db_tile: int, r1: int):
    def kernel(db_ref, qt_ref, qn_ref, hw_ref, out_ref):
        db = db_ref[:]
        dots = jax.lax.dot_general(
            db,
            qt_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_phase1_precision(db.dtype),
            preferred_element_type=jnp.float32,
        )  # [T, Bt]
        qn = qn_ref[:]  # [1, Bt]
        db32 = db.astype(jnp.float32)
        sqn = jnp.sum(db32 * db32, axis=1, keepdims=True)  # [T, 1] in-register
        if metric == "l2":
            dist = jnp.maximum(sqn + qn - 2.0 * dots, 0.0)
        elif metric == "ip":
            dist = 1.0 - dots
        else:  # cosine
            denom = jax.lax.rsqrt(jnp.maximum(sqn * qn, 1e-30))
            dist = 1.0 - dots * denom
        # mask the unwritten capacity tail arithmetically: zero DMA cost
        di = pl.program_id(0)
        row = di * db_tile + jax.lax.broadcasted_iota(jnp.int32, (db_tile, 1), 0)
        dist = jnp.where(row < hw_ref[0, 0], dist, 3.0e38)  # == distances.MASKED
        out_ref[:] = _winmin(dist, r1)

    return kernel


def _masked_kernel(metric: str, r1: int):
    def kernel(db_ref, qt_ref, qn_ref, bias_ref, out_ref):
        db = db_ref[:]
        dots = jax.lax.dot_general(
            db,
            qt_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_phase1_precision(db.dtype),
            preferred_element_type=jnp.float32,
        )
        qn = qn_ref[:]      # [1, Bt]
        bias = bias_ref[:]  # [T, 1]: l2 -> sq_norms+mask; ip/cosine -> mask
        if metric == "l2":
            dist = jnp.maximum(bias + qn - 2.0 * dots, 0.0)
        elif metric == "ip":
            dist = 1.0 - dots + bias
        else:
            db32 = db.astype(jnp.float32)
            sqn = jnp.sum(db32 * db32, axis=1, keepdims=True)
            denom = jax.lax.rsqrt(jnp.maximum(sqn * qn, 1e-30))
            dist = 1.0 - dots * denom + bias
        out_ref[:] = _winmin(dist, r1)

    return kernel


def _common_specs(db_tile, Dp, q_tile):
    # grid = (n_db_tiles, n_q_tiles): db outermost => one HBM sweep of the database total
    return [
        pl.BlockSpec((db_tile, Dp), lambda di, qi: (di, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Dp, q_tile), lambda di, qi: (0, qi), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q_tile), lambda di, qi: (0, qi), memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.jit, static_argnames=("metric", "q_tile", "db_tile", "r1"))
def _window_mins_fast(data, qt, qn, hw, *, metric, q_tile, db_tile, r1):
    N, Dp = data.shape
    B = qt.shape[1]
    W = db_tile // r1
    return pl.pallas_call(
        _fast_kernel(metric, db_tile, r1),
        grid=(N // db_tile, B // q_tile),
        in_specs=_common_specs(db_tile, Dp, q_tile)
        + [pl.BlockSpec((1, 1), lambda di, qi: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (W, q_tile), lambda di, qi: (di, qi), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N // r1, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * Dp,
            bytes_accessed=N * Dp * data.dtype.itemsize + B * (N // r1) * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(data, qt, qn, hw)


@functools.partial(jax.jit, static_argnames=("metric", "q_tile", "db_tile", "r1"))
def _window_mins_masked(data, qt, qn, bias, *, metric, q_tile, db_tile, r1):
    N, Dp = data.shape
    B = qt.shape[1]
    W = db_tile // r1
    return pl.pallas_call(
        _masked_kernel(metric, r1),
        grid=(N // db_tile, B // q_tile),
        in_specs=_common_specs(db_tile, Dp, q_tile)
        + [pl.BlockSpec((db_tile, 1), lambda di, qi: (di, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (W, q_tile), lambda di, qi: (di, qi), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N // r1, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * Dp,
            bytes_accessed=N * Dp * data.dtype.itemsize + B * (N // r1) * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(data, qt, qn, bias)


@functools.partial(jax.jit, static_argnames=("k", "metric", "db_tile", "masked", "r1"))
def _select_and_rescan(q, qn_row, data, maskadd, hw, wmin1t, *, k, metric, db_tile, masked, r1):
    """Hierarchical selection over phase-1 window mins + exact rescan of candidates.

    wmin1t is [W1, B] (transposed); all wide reductions happen on small tensors.
    ``masked=False`` (fast path: live prefix [0, hw), no tombstones/filter) masks
    candidates arithmetically against the scalar ``hw`` — no mask gather at all;
    ``masked=True`` gathers the true per-row maskadd.  Row norms are recomputed from the
    gathered candidate rows, so no sq_norms gather is needed either.
    """
    B = q.shape[0]
    W1 = wmin1t.shape[0]
    # Selection margin: the exactness argument only needs s >= k (see module docstring);
    # the extra 16 absorbs float rounding differences between phase-1 window mins and the
    # HIGHEST-precision rescan for windows straddling the selection boundary.
    s = min(min(2 * k, k + 16), W1)

    if W1 % R2 == 0 and W1 // R2 > 1:
        W2 = W1 // R2
        wmin2 = wmin1t.reshape(W2, R2, B).min(axis=1).T           # [B, W2] (small transpose)
        s2 = min(min(2 * k, k + 16), W2)
        _, w2i = jax.lax.top_k(-wmin2, s2)                        # [B, s2]
        l1_ids = (w2i[:, :, None] * R2 + jnp.arange(R2)[None, None, :]).reshape(B, s2 * R2)
        # vals[b, j] = wmin1t[l1_ids[b, j], b] — per-query scalar gather, [B, s2*R2]
        l1_vals = jax.vmap(lambda col, ids: col[ids], in_axes=(1, 0))(wmin1t, l1_ids)
    else:
        l1_ids = jnp.broadcast_to(jnp.arange(W1, dtype=jnp.int32)[None, :], (B, W1))
        l1_vals = wmin1t.T

    s1 = min(s, l1_vals.shape[1])
    _, pos = jax.lax.top_k(-l1_vals, s1)                          # [B, s1]
    win = jnp.take_along_axis(l1_ids, pos, axis=1)                # level-1 window ids

    # candidate rows (strided window layout, see module docstring)
    W = db_tile // r1
    base = (win // W) * db_tile + (win % W)                       # [B, s1]
    rows = (base[:, :, None] + jnp.arange(r1)[None, None, :] * W).reshape(B, s1 * r1)

    sub = data[rows.reshape(-1)].astype(jnp.float32).reshape(B, s1 * r1, -1)
    dots = jax.lax.dot_general(
        q,
        sub,
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [B, s1*R1]
    sqn_c = jnp.sum(sub * sub, axis=-1)                           # norms from the rows
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
        dist = jnp.where(rows < hw, dist, MASKED)  # unwritten-tail mask, zero gathers

    kk = min(k, dist.shape[1])
    neg, p = jax.lax.top_k(-dist, kk)
    best_d = -neg
    best_i = jnp.take_along_axis(rows, p, axis=1).astype(jnp.int32)
    if kk < k:
        best_d = jnp.pad(best_d, ((0, 0), (0, k - kk)), constant_values=float(MASKED))
        best_i = jnp.pad(best_i, ((0, 0), (0, k - kk)))
    return best_d, best_i


def exact_knn_pallas(
    q: jax.Array,
    data: jax.Array,
    valid: jax.Array,
    sq_norms: jax.Array,
    *,
    k: int,
    metric: str,
    db_tile: int = DB_TILE,
    live_prefix: int | None = None,
    rescan_data: jax.Array | None = None,
    r1_override: int | None = None,
):
    """Drop-in TPU backend for ops.topk.exact_knn (same contract).

    ``live_prefix``: host-known hint that rows [0, live_prefix) are exactly the live rows
    (no tombstones, no filter) — enables the fast no-mask kernel.  None => use the masked
    kernel driven by ``valid``.

    ``rescan_data``: optional higher-precision copy of ``data`` (same shape) for the
    phase-2 rescan.  The bandwidth-bound phase-1 sweep reads ``data`` (e.g. a bf16
    mirror at half the HBM traffic) while candidate scoring reads full-precision rows —
    bf16-sweep speed with f32-exact results for 1.5x storage.

    ``r1_override``: pin the level-1 window width instead of the adaptive heuristic
    (benchmark exploration).

    Falls back to the pure-XLA scan for shapes the fused path does not cover (small
    namespaces, capacities not tileable, oversized k).
    """
    cap = data.shape[0]
    B = q.shape[0]
    tile = DB_TILE
    qt_w = min(Q_TILE, B)
    r1 = r1_override or _pick_r1(B, cap, k)
    if (
        cap < 2 * tile
        or cap % tile != 0
        or B % qt_w != 0
        or q.shape[1] % 128 != 0
        or k * r1 > cap
    ):
        if rescan_data is not None:
            data = rescan_data  # scan path has no phase split; use the exact copy
        return exact_knn(q, data, valid, sq_norms, k=k, metric=metric, db_tile=db_tile)
    rescan_src = data if rescan_data is None else rescan_data

    q32 = q.astype(jnp.float32)
    qn_row = jnp.sum(q32 * q32, axis=-1)                          # [B]
    qn = qn_row.reshape(1, B)                                     # [1, B]
    qtarr = q32.T.astype(data.dtype)                              # [Dp, B]

    if live_prefix is not None:
        hw = jnp.asarray([[live_prefix]], jnp.int32)
        wmin1t = _window_mins_fast(
            data, qtarr, qn, hw, metric=metric, q_tile=qt_w, db_tile=tile, r1=r1
        )
        return _select_and_rescan(
            q32, qn_row[:, None], rescan_src, sq_norms, jnp.int32(live_prefix), wmin1t,
            k=k, metric=metric, db_tile=tile, masked=False, r1=r1,
        )

    maskadd = jnp.where(valid, 0.0, MASKED).astype(jnp.float32)   # [N]
    if metric == "l2":
        bias = (sq_norms.astype(jnp.float32) + maskadd).reshape(cap, 1)
    else:
        bias = maskadd.reshape(cap, 1)
    wmin1t = _window_mins_masked(
        data, qtarr, qn, bias, metric=metric, q_tile=qt_w, db_tile=tile, r1=r1
    )
    return _select_and_rescan(
        q32, qn_row[:, None], rescan_src, maskadd, jnp.int32(cap), wmin1t,
        k=k, metric=metric, db_tile=tile, masked=True, r1=r1,
    )
