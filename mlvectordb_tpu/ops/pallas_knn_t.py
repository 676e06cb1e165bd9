"""Window-major sweep exact kNN: the round-3 roofline kernel.

Round 2's transposed sweep hit the HBM roofline in phase 1 but left phase 2 paying two
structural taxes, measured on v5e through the selection probes
(benchmarks/explore_select.py):

  * XLA row gathers move ~47 GB/s (≈11 ns/512B row, overhead-bound) — at k=1000 the
    s1*r1 candidate rows cost 11+ ms/batch-128, and at DEEP-10M shape (r1=32) the
    26*32-row rescan dominated phase 2.
  * 3-D ``take_along_axis`` block gathers are 3-4x worse still (~34 ns per 128B block).

This redesign makes every phase-2 access either a CONTIGUOUS wide-row gather
(2-4 KB blocks measure 110-140 GB/s) or a flat 2-D row gather:

  WINDOW-MAJOR LAYOUT.  The sweep mirror ``data_t`` [Dp, cap] stores its columns
  PERMUTED so that the kernel's lane-slice window-min — the only reduction Mosaic does
  at full speed — lands on windows of CONSECUTIVE store rows.  Column
  c = t*SWEEP_TILE + r*WLANE + j holds store row (t*WLANE + j)*R1MAX + r; window-min
  over the r1-group lane slices then reduces store rows [f*r1, (f+1)*r1) for fine
  window f.  Phase 2 gathers candidates as dataw = rescan.reshape(cap//r1, r1*Dp)
  rows — one contiguous r1*row DMA per window instead of r1 scattered row gathers.
  The permutation is pure arithmetic (per tile, columns are the [WLANE, R1MAX]
  transpose of rows), so per-row vectors permute with one reshape-transpose and
  scatters compute their target columns host-side (``sweep_cols_for_rows``).

  GROUPED EMISSION.  One kernel serves every window width r1 in {1,2,4,8,16,32}: the
  [Bt, T] rank block reduces in g = R1MAX//r1 groups of r1 aligned WLANE-wide lane
  slices, emitting [Bt, g*WLANE] per tile.  Output position p = t*g*WLANE + a*WLANE + j
  maps to window f = (t*WLANE + j)*g + a arithmetically.  Small r1 (large k) no longer
  multiplies rescan cost by stride games; large r1 (small k) keeps the window-min
  matrix small.

  ONE DISPATCH.  Query prep (metric factor folding, bias/scale permutation, liveness),
  the Pallas sweep, hierarchical selection (flat 2-D gathers only; chunked top_k for
  wide inputs at large k), and the exact HIGHEST-precision rescan all trace into a
  single jitted program — one host->device transfer in, one device->host out
  (engine/query_processor.py counts them).

Phase 1 ranks, it does not score (per-query constants dropped; the metric's scalar
factor folds into the query operand).  Exactness argument is unchanged from round 1/2:
a true top-k element's window can only be dropped if >= s selected windows each contain
a closer element (s >= k); the +16 margin absorbs phase-1 vs rescan rounding, and with a
bf16 sweep the bench/suite recall gates pin that the margin holds on the target
workloads.  Replaces the role of hnswlib's graph walk (reference:
src/mlvectordb/implementations/index.py:111).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .distances import MASKED
from .pallas_knn import VMEM_LIMIT
from .topk import exact_knn

SWEEP_TILE = 4096          # db rows per phase-1 grid step (fixed by the layout)
DB_TILE = SWEEP_TILE       # backward-compat alias
R1MAX = 32                 # layout interleave factor = max window width
WLANE = SWEEP_TILE // R1MAX  # 128: one lane vector per window-min slice
Q_TILE = 256
R2 = 32                    # fine windows per level-2 selection block


# ------------------------------------------------------------------ layout helpers

def to_sweep_layout(data: jax.Array, dtype=None, shard_cap: int | None = None) -> jax.Array:
    """[cap, Dp] row-major -> [Dp, cap] window-major sweep layout.

    ``shard_cap``: for mesh-sharded stores, permute within each shard's row range so
    every shard's column block is its own valid local layout (shard_cap must be a
    multiple of SWEEP_TILE)."""
    cap, Dp = data.shape
    unit = shard_cap or cap
    if unit % SWEEP_TILE or cap % unit:
        raise ValueError(f"sweep layout needs capacity in {SWEEP_TILE}-row tiles, got {cap}/{unit}")
    s = cap // unit
    nt = unit // SWEEP_TILE
    out = (
        data.reshape(s, nt, WLANE, R1MAX, Dp)
        .transpose(4, 0, 1, 3, 2)
        .reshape(Dp, cap)
    )
    return out.astype(dtype) if dtype is not None else out


def sweep_rows_1d(vec: jax.Array, shard_cap: int | None = None) -> jax.Array:
    """Permute a per-row [cap] vector into sweep column order (pure reshape/transpose)."""
    cap = vec.shape[-1]
    unit = shard_cap or cap
    s = cap // unit
    nt = unit // SWEEP_TILE
    return vec.reshape(s, nt, WLANE, R1MAX).swapaxes(-1, -2).reshape(cap)


def sweep_cols_for_rows(rows, shard_cap: int | None = None):
    """Store rows -> sweep mirror columns (vectorized int arithmetic; np or jnp)."""
    if shard_cap is not None:
        sh = rows // shard_cap
        loc = rows % shard_cap
        return sh * shard_cap + sweep_cols_for_rows(loc)
    w = rows // R1MAX
    r = rows % R1MAX
    t = w // WLANE
    j = w % WLANE
    return t * SWEEP_TILE + r * WLANE + j


# ------------------------------------------------------------------ phase 1 kernel

def _phase1_precision(dtype):
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def _sweep_kernel(g: int, use_scale: bool):
    """rank = dots [* scale_row] + bias_row, then grouped window-min over lane slices.

    bias_row carries everything per-row (l2 sq_norms, tombstone/filter mask, unwritten
    tail) in sweep column order, so the kernel has no branches at all.  Group a of the
    output covers fine windows (t*WLANE + j)*g + a == store rows [f*r1, (f+1)*r1).
    """
    r1 = R1MAX // g

    def kernel(q_ref, db_ref, scale_ref, bias_ref, out_ref):
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
        rank = rank + bias_ref[:]
        for a in range(g):
            acc = rank[:, (a * r1) * WLANE : (a * r1 + 1) * WLANE]
            for rr in range(1, r1):
                r = a * r1 + rr
                acc = jnp.minimum(acc, rank[:, r * WLANE : (r + 1) * WLANE])
            out_ref[:, a * WLANE : (a + 1) * WLANE] = acc

    return kernel


def _window_mins(qh, data_t, scale_row, bias_row, *, q_tile, g):
    """qh [B, Dp] (metric factor pre-folded), data_t [Dp, cap] sweep layout ->
    window-min positions [B, cap // (R1MAX//g)]."""
    Dp, cap = data_t.shape
    B = qh.shape[0]
    out_w = g * WLANE
    grid = (cap // SWEEP_TILE, B // q_tile)  # db outermost: one HBM sweep total
    return pl.pallas_call(
        _sweep_kernel(g, scale_row is not None),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, Dp), lambda di, qi: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, SWEEP_TILE), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SWEEP_TILE), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SWEEP_TILE), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (q_tile, out_w), lambda di, qi: (qi, di), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, (cap // SWEEP_TILE) * out_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * cap * Dp,
            bytes_accessed=cap * Dp * data_t.dtype.itemsize
            + B * (cap // SWEEP_TILE) * out_w * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(qh, data_t, scale_row if scale_row is not None else bias_row, bias_row)


# ------------------------------------------------------------------ phase 2 selection

def _pos_to_window(p, g: int):
    """Output position -> fine window id (see module docstring layout)."""
    gw = g * WLANE
    t = p // gw
    rem = p - t * gw
    a = rem // WLANE
    j = rem - a * WLANE
    return (t * WLANE + j) * g + a


def _topk_small(x, kk: int):
    """(values, idx) of the kk SMALLEST entries per row of x [B, W].

    For wide inputs at large k, XLA's top_k degrades to ~0.07 ms per 1024 lanes
    (measured); chunking into 2048-wide top_k's and merging once is ~3x faster at
    [B, 32768] k~1000."""
    B, W = x.shape
    if kk > 256 and W > 8192 and W % 2048 == 0:
        nch = W // 2048
        kc = min(kk, 2048)
        v, i = jax.lax.top_k(-x.reshape(B * nch, 2048), kc)
        v = v.reshape(B, nch, kc).reshape(B, nch * kc)
        iglob = (
            i.reshape(B, nch, kc) + (jnp.arange(nch, dtype=jnp.int32) * 2048)[None, :, None]
        ).reshape(B, nch * kc)
        v2, p = jax.lax.top_k(v, kk)
        return -v2, jnp.take_along_axis(iglob, p, axis=1)
    neg, i = jax.lax.top_k(-x, kk)
    return -neg, i


def _flat_rows(mat3, idx):
    """Flat 2-D row gather: mat3 [B, W, C] rows selected by idx [B, s] -> [B, s, C].

    Lowars to the fast flat gather (~11 ns/row) instead of the 3-4x slower 3-D
    take_along_axis (measured in benchmarks/explore_select.py)."""
    B, W, C = mat3.shape
    flat = mat3.reshape(B * W, C)
    gidx = idx + (jnp.arange(B, dtype=idx.dtype) * W)[:, None]
    return flat[gidx.reshape(-1)].reshape(B, idx.shape[1], C)


def _select_and_rescan(q32, qn_row, rescan, maskadd, hw, wmin, *, k, metric, r1, masked):
    """Hierarchical window selection + exact HIGHEST rescan of contiguous windows."""
    B, P = wmin.shape
    g = R1MAX // r1
    s = min(min(2 * k, k + 16), P)

    if P % R2 == 0 and P // R2 > 1:
        W2 = P // R2
        wmin3 = wmin.reshape(B, W2, R2)
        wmin2 = wmin3.min(axis=-1)                        # [B, W2]
        s2 = min(s, W2)
        _, w2i = _topk_small(wmin2, s2)                   # [B, s2]
        l1_vals = _flat_rows(wmin3, w2i).reshape(B, s2 * R2)
        s1 = min(s, s2 * R2)
        _, pos = _topk_small(l1_vals, s1)                 # [B, s1]
        w2sel = jnp.take_along_axis(w2i, pos // R2, axis=1)
        p = w2sel * R2 + pos % R2                         # output positions
    else:
        s1 = min(s, P)
        _, p = _topk_small(wmin, s1)

    f = _pos_to_window(p, g)                              # [B, s1] fine windows
    cap, Dp = rescan.shape
    # contiguous window gather: one r1-row (r1*Dp*itemsize bytes) DMA per window
    dataw = rescan.reshape(cap // r1, r1 * Dp)
    sub = (
        dataw[f.reshape(-1)]
        .reshape(B, s1 * r1, Dp)
        .astype(jnp.float32)
    )
    rows = (f[:, :, None] * r1 + jnp.arange(r1, dtype=jnp.int32)).reshape(B, s1 * r1)

    dots = jax.lax.dot_general(
        q32,
        sub,
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [B, s1*r1]
    sqn_c = jnp.sum(sub * sub, axis=-1)                   # norms from the rows
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
        dist = jnp.where(rows < hw, dist, MASKED)         # arithmetic tail mask

    kk = min(k, dist.shape[1])
    neg, pk = jax.lax.top_k(-dist, kk)
    best_d = -neg
    best_i = jnp.take_along_axis(rows, pk, axis=1).astype(jnp.int32)
    if kk < k:
        best_d = jnp.pad(best_d, ((0, 0), (0, k - kk)), constant_values=float(MASKED))
        best_i = jnp.pad(best_i, ((0, 0), (0, k - kk)))
    return best_d, best_i


# ------------------------------------------------------------------ fused program

@functools.partial(jax.jit, static_argnames=("k", "metric", "r1", "masked", "q_tile"))
def _fused_t(q, data_t, rescan, valid, sq_norms, hw, *, k, metric, r1, masked, q_tile):
    """The whole search — prep, sweep, selection, rescan — as ONE dispatched program."""
    Dp, cap = data_t.shape
    g = R1MAX // r1
    q32 = q.astype(jnp.float32)
    qn_row = jnp.sum(q32 * q32, axis=-1)

    sqn = sq_norms.astype(jnp.float32)
    if masked:
        maskadd = jnp.where(valid, 0.0, MASKED).astype(jnp.float32)
    else:
        maskadd = jnp.where(jnp.arange(cap) < hw, 0.0, MASKED)
    bias = (sqn + maskadd) if metric == "l2" else maskadd
    bias_row = sweep_rows_1d(bias).reshape(1, cap)

    if metric == "l2":
        qh = (-2.0 * q32).astype(data_t.dtype)
        scale_row = None
    elif metric == "ip":
        qh = (-q32).astype(data_t.dtype)
        scale_row = None
    else:  # cosine: rank by -dots/|d| (+mask); 1/|q| is a per-query constant, dropped
        qh = (-q32).astype(data_t.dtype)
        scale_row = sweep_rows_1d(jax.lax.rsqrt(jnp.maximum(sqn, 1e-30))).reshape(1, cap)

    wmin = _window_mins(qh, data_t, scale_row, bias_row, q_tile=q_tile, g=g)
    return _select_and_rescan(
        q32, qn_row[:, None], rescan, maskadd, hw, wmin,
        k=k, metric=metric, r1=r1, masked=masked,
    )


# ------------------------------------------------------------------ public entry

def _pick_r1(batch: int, n_rows: int, k: int) -> int:
    """Window width: small k wants wide windows (small window-min matrix, the
    contiguous rescan makes wide windows nearly free); large k wants narrow windows
    (rescan payload is s1*r1 rows/query).  Floor by window-min matrix memory
    (B*N*4/r1 bytes must stay bounded)."""
    if k <= 16:
        r1 = 32
    elif k <= 64:
        r1 = 16
    elif k <= 256:
        r1 = 8
    else:
        r1 = 4
    while r1 < R1MAX and batch * n_rows * 4 // r1 > (1 << 31):  # cap wmin at 2 GB
        r1 *= 2
    return r1


def exact_knn_pallas_t(
    q: jax.Array,
    data_t: jax.Array,        # [Dp, cap] SWEEP-LAYOUT mirror (to_sweep_layout) — bf16 or f32
    rescan_data: jax.Array,   # [cap, Dp] row-major full-precision rows
    valid: jax.Array,
    sq_norms: jax.Array,
    *,
    k: int,
    metric: str,
    db_tile: int = SWEEP_TILE,   # kept for signature compat; the layout fixes the tile
    live_prefix: int | None = None,
    r1_override: int | None = None,
):
    """Window-major sweep exact kNN; same results contract as ops.topk.exact_knn.

    ``data_t`` MUST be in the window-major sweep layout (``to_sweep_layout``); the
    store maintains it incrementally via ``sweep_cols_for_rows`` scatters.  Falls back
    to the row-major scan for shapes the fused path does not cover.
    """
    Dp, cap = data_t.shape
    B = q.shape[0]
    qt_w = min(Q_TILE, B)
    r1 = r1_override or _pick_r1(B, cap, k)
    if (
        cap < 2 * SWEEP_TILE
        or cap % SWEEP_TILE != 0
        or B % qt_w != 0
        or Dp % 128 != 0
        or k * r1 > cap
        or r1 not in (1, 2, 4, 8, 16, 32)
    ):
        return exact_knn(q, rescan_data, valid, sq_norms, k=k, metric=metric, db_tile=db_tile)

    masked = live_prefix is None
    hw = jnp.int32(cap if masked else live_prefix)
    return _fused_t(
        q, data_t, rescan_data, valid, sq_norms, hw,
        k=k, metric=metric, r1=r1, masked=masked, q_tile=qt_w,
    )
