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
factor folds into the query operand).  Exactness (default, ``certify=True``) is
MACHINE-CHECKED per query: the sweep kernel emits OPTIMISTIC window-mins directly
(each column's rank lowered by its own measured data-side error norm, scaled per
query — a rank-1 FMA folded into the bandwidth-bound sweep), and the
certificate proves that every window left unscanned has true min rank beyond the
k-th found distance.  Escalation is three-tier — certified fast selection, an 8x
wider selection reusing the same window-min matrix, then a full-precision exact
scan — so a failed proof costs speed, never correctness.  ``certify=False``
(margin mode) returns tier 1 unconditionally: exactness then rests on the
empirical +16 selection margin plus the benchmark recall gates (the documented
speed/proof trade; see EngineConfig.certify_exact).  Replaces the role of
hnswlib's graph walk (reference: src/mlvectordb/implementations/index.py:111).
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


def sweep_err_norms(data: jax.Array) -> jax.Array:
    """Per-row ``||row - bf16(row)||`` norms for MIXED f32-store/bf16-sweep configs —
    feeds the exactness certificate's tight data-side error bound (see _fused_t)."""
    d32 = data.astype(jnp.float32)
    delta = d32 - d32.astype(jnp.bfloat16).astype(jnp.float32)
    return jnp.sqrt(jnp.sum(delta * delta, axis=-1))


def quantize_int8_rows(vals: jax.Array):
    """Row-wise int8 PRIMARY quantization (sweep_dtype="int8"): row ~ scale * z with
    z int8 and a per-row scale.  Returns ``(z [n, Dp] int8, scale [n] f32,
    err [n] f32)`` with err = ||row - scale*z|| — the certificate's data-side bound
    (phase 1 at 1 byte/element; ~2x the bf16 sweep's bandwidth headroom, ~2x its
    error band — the proof decides per corpus whether that is enough)."""
    v32 = vals.astype(jnp.float32)
    scale = jnp.max(jnp.abs(v32), axis=-1) / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)[:, None]
    z = jnp.clip(jnp.round(v32 / safe), -127.0, 127.0)
    z = jnp.where(scale[:, None] > 0, z, 0.0)
    rem = v32 - scale[:, None] * z
    err = jnp.sqrt(jnp.sum(rem * rem, axis=-1))
    return z.astype(jnp.int8), scale, err


def quantize_int8(data: jax.Array, shard_cap: int | None = None):
    """Whole-store int8 sweep mirror: ``(codes [Dp, cap] int8 sweep layout,
    scale [cap] f32, err [cap] f32)`` — see quantize_int8_rows."""
    z, scale, err = quantize_int8_rows(data)
    return to_sweep_layout(z, shard_cap=shard_cap), scale, err


def quantize_int8_resid_rows(vals: jax.Array):
    """Two-level int8 quantization: row ~ s1*z1 + s2*z2 (1+1 bytes/element).

    The residual-corrected PRIMARY-int8 sweep (sweep_dtype="int8" + sweep_resid):
    z2 encodes delta1 = row - s1*z1 with its own per-row scale s2 <= s1/254, so the
    remaining data-side band err2 = ||delta1 - s2*z2|| is ~2^-15 of the row's max
    element — comparable to the bf16+int8-resid band at 2/3 the HBM bytes and one
    fewer byte-stream (2 B/element total vs 3).  Returns
    ``(z1 [n, Dp] int8, s1 [n] f32, z2 [n, Dp] int8, s2 [n] f32, err2 [n] f32,
    err1 [n] f32)`` with err1 = ||delta1|| bounding the query-residual cross term."""
    v32 = vals.astype(jnp.float32)
    z1, s1, e1 = quantize_int8_rows(v32)
    delta = v32 - s1[:, None] * z1.astype(jnp.float32)
    s2 = jnp.max(jnp.abs(delta), axis=-1) / 127.0
    safe = jnp.where(s2 > 0, s2, 1.0)[:, None]
    z2 = jnp.clip(jnp.round(delta / safe), -127.0, 127.0)
    z2 = jnp.where(s2[:, None] > 0, z2, 0.0)
    rem = delta - s2[:, None] * z2
    e2 = jnp.sqrt(jnp.sum(rem * rem, axis=-1))
    return z1, s1, z2.astype(jnp.int8), s2, e2, e1


def quantize_int8_resid(data: jax.Array, shard_cap: int | None = None):
    """Whole-store two-level int8 sweep: ``(codes [Dp, cap] int8 sweep layout,
    s1 [cap] f32, resid [Dp, cap] int8 sweep layout, s2 [cap] f32, err2 [cap] f32,
    err1 [cap] f32)`` — see quantize_int8_resid_rows."""
    z1, s1, z2, s2, e2, e1 = quantize_int8_resid_rows(data)
    return (
        to_sweep_layout(z1, shard_cap=shard_cap), s1,
        to_sweep_layout(z2, shard_cap=shard_cap), s2, e2, e1,
    )


def quantize_resid_rows(vals: jax.Array):
    """Row-wise int8 residual quantization for MIXED f32-store/bf16-sweep configs.

    delta = row - bf16(row) is encoded as scale * z with z int8 and a per-row scale:
    returns ``(z [n, Dp] int8, scale [n] f32, err2 [n] f32, err1 [n] f32)`` where
    err2 = ||delta - scale*z|| (the certificate's remaining data-side bound, ~2^-8
    of err1) and err1 = ||delta|| (bounds the query-residual cross term)."""
    v32 = vals.astype(jnp.float32)
    delta = v32 - v32.astype(jnp.bfloat16).astype(jnp.float32)
    e1 = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
    scale = jnp.max(jnp.abs(delta), axis=-1) / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)[:, None]
    z = jnp.clip(jnp.round(delta / safe), -127.0, 127.0)
    z = jnp.where(scale[:, None] > 0, z, 0.0)
    rem = delta - scale[:, None] * z
    e2 = jnp.sqrt(jnp.sum(rem * rem, axis=-1))
    return z.astype(jnp.int8), scale, e2, e1


def quantize_resid(data: jax.Array, shard_cap: int | None = None):
    """Whole-store residual quantization: ``(resid [Dp, cap] int8 sweep layout,
    scale [cap] f32, err2 [cap] f32, err1 [cap] f32)`` — see quantize_resid_rows."""
    z, scale, e2, e1 = quantize_resid_rows(data)
    return to_sweep_layout(z, shard_cap=shard_cap), scale, e2, e1


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


def _topm_sub_rows(m: int) -> int:
    """Sublane rows of the top-m epilogue output block: m value rows + ceil(m/2)
    packed-position rows, padded up to a multiple of 8 (Mosaic block rule)."""
    return -(-(m + (m + 1) // 2) // 8) * 8


def _sweep_kernel(g: int, use_scale: bool, two_pass: bool, use_resid: bool,
                  n_eb: int = 0, n_top: int = 0, skip_wm: bool = False):
    """rank = dots [+ resid correction] [* scale_row] + bias_row
    [- sum_t qe_t * eb_t], then grouped window-min over lane slices.

    bias_row carries everything per-row (l2 sq_norms, tombstone/filter mask, unwritten
    tail) in sweep column order, so the kernel has no branches at all.  Group a of the
    output covers fine windows (t*WLANE + j)*g + a == store rows [f*r1, (f+1)*r1).

    ``two_pass``: compensated query for bf16 sweeps — the folded query is split into
    a bf16 head + bf16 residual and both are dotted against the resident block
    (second matmul reads the block from VMEM, not HBM), eliminating the query-side
    rounding term from the exactness certificate at no bandwidth cost.

    ``use_resid``: residual-corrected bf16 sweep — the store additionally streams an
    int8 quantization of each row's bf16 rounding residual (delta = row - bf16(row),
    quantized with a per-row scale).  One more VMEM matmul recovers qh . delta to the
    int8 quantizer's precision, shrinking the certificate's data-side error band
    ~2^-8x: phase-1 ranks become exact enough that tier-1 certifies even on corpora
    whose neighbour gaps sit far below the raw bf16 band (VERDICT r3 #1).  Costs
    +1 byte/element of HBM and one bf16 MXU pass.

    ``n_eb``: number of per-row certificate error-bound terms FOLDED INTO THE
    SWEEP (0..2).  Each term is a [1, T] per-row bound eb_t in sweep column order
    scaled by a per-query factor qe_t (lane t of qe_ref): the emitted window-mins
    become the certificate's OPTIMISTIC lower bounds directly.  Folding here is a
    rank-1 VPU FMA on a bandwidth-bound kernel (free) and replaces the downstream
    per-window adjustment passes — whose refine-stage form was per-candidate
    128-byte row gathers, the slowest gather class on this hardware (~3 GB/s,
    round-3 gather probe).  min_r (rank_r - qe*e_r) is also a TIGHTER bound than
    the old min_r rank_r - qe*max_r e_r, so tier-1 certifies strictly more often.

    ``n_top``: emit the tile's n_top SMALLEST window-mins (values + positions)
    in an epilogue — per-tile top-m candidates extracted by m rounds of
    cross-lane min / argmin / mask (no sort network; Mosaic lowers iterated
    mins).  The downstream selection then runs on an [B, nt*m] candidate pool
    instead of the full window-min matrix, deleting the level-2 reduce, the
    tile-row gather and the wide level-1 top_k.  SOUND under the certificate
    only: a tile hiding more than m true candidates lowers the selection
    floor (the min over tiles of each tile's m-th min folds into ``thresh``)
    and the batch escalates a tier instead of returning a wrong set.  Output
    block [1, SUB, q_tile]: rows 0..m-1 the values, rows m.. the positions
    within the tile's out_w window-mins, packed two per f32 (p0 + out_w*p1 —
    exact in f32 while out_w^2 <= 2^24, i.e. out_w <= 4096, matching the
    use_topm gate), padding rows +inf.  NaN inputs (NaN query or data row)
    match no lane in the float-equality argmin, so pos stays at the BIGP
    sentinel (= out_w) and the packed value decodes to an out-of-range window
    the rescan gather clamps; exactness still holds because a NaN kth
    distance fails check_exact and the batch escalates.

    ``skip_wm``: do not emit the window-min matrix at all — the top-m pool is
    the ONLY output.  Used when the pool serves tier 1 and the width gate has
    already ruled tier 2 out (escalation goes straight to the exact scan), so
    the [nt, B, out_w] matrix would be written (134 MB at 1M/r1=4) and never
    read; skipping it saves the write bandwidth AND removes the large live
    buffer XLA otherwise schedules the rescan gather under.
    """
    r1 = R1MAX // g

    def kernel(q_ref, qr_ref, db_ref, resid_ref, rscale_ref, scale_ref, bias_ref,
               qe_ref, eb1_ref, eb2_ref, out_ref, *out2):
        db = db_ref[:]
        if db.dtype == jnp.int8:
            # int8 PRIMARY sweep: codes are integers <= 127, exact in bf16; the
            # per-row dequant scale rides in scale_ref (folded by the caller)
            db = db.astype(jnp.bfloat16)
        dots = jax.lax.dot_general(
            q_ref[:],
            db,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_phase1_precision(db.dtype),
            preferred_element_type=jnp.float32,
        )  # [Bt, T]
        if two_pass:
            dots = dots + jax.lax.dot_general(
                qr_ref[:],
                db,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=_phase1_precision(db.dtype),
                preferred_element_type=jnp.float32,
            )
        if use_resid:
            # int8 residual codes are integers <= 127: the bf16 cast is EXACT, so
            # this pass adds no representational error of its own beyond the f32
            # accumulation slack the certificate already carries
            corr = jax.lax.dot_general(
                q_ref[:],
                resid_ref[:].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )
            dots = dots + corr * rscale_ref[:]
        rank = dots
        if use_scale:
            rank = rank * scale_ref[:]
        rank = rank + bias_ref[:]
        for t in range(n_eb):
            ebr = (eb1_ref, eb2_ref)[t]
            rank = rank - qe_ref[:, t : t + 1] * ebr[:]
        topm_ref = out_ref if skip_wm else (out2[0] if out2 else None)
        accs = []
        for a in range(g):
            acc = rank[:, (a * r1) * WLANE : (a * r1 + 1) * WLANE]
            for rr in range(1, r1):
                r = a * r1 + rr
                acc = jnp.minimum(acc, rank[:, r * WLANE : (r + 1) * WLANE])
            if skip_wm:
                pass                                      # pool is the only output
            elif out_ref.ndim == 3:  # transposed [1, Bt, out_w] block (tile-major)
                out_ref[0, :, a * WLANE : (a + 1) * WLANE] = acc
            else:
                out_ref[:, a * WLANE : (a + 1) * WLANE] = acc
            accs.append(acc)
            if out2 and not n_top:
                # LEVEL-2 block-min epilogue (g=1 only: one 128-window block per
                # tile): the cross-lane min lands on sublanes, so broadcast it
                # across 8 sublanes to satisfy Mosaic's (8, 128)-divisible output
                # block rule — a 4 KB store per tile in place of the XLA reduce's
                # full re-read of the window-min matrix (~0.2-0.6 ms at DEEP).
                out2[0][0] = jnp.broadcast_to(jnp.min(acc, axis=1)[None, :],
                                              out2[0].shape[1:])
        if n_top:
            # TOP-M candidate epilogue: m rounds of (cross-lane min over the
            # tile's g*WLANE window-mins, position-of-min, mask-and-repeat).
            # Positions are a*WLANE + lane within the tile's out_w output.
            Bt = accs[0].shape[0]
            out_w = g * WLANE
            BIGP = jnp.int32(out_w)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (Bt, WLANE), 1)
            work = list(accs)
            vals, poss = [], []
            for _ in range(n_top):
                m1 = work[0].min(axis=1)
                for a in range(1, g):
                    m1 = jnp.minimum(m1, work[a].min(axis=1))
                pos = jnp.full((Bt,), BIGP)
                for a in range(g):
                    pa = jnp.min(
                        jnp.where(work[a] == m1[:, None], lanes + a * WLANE, BIGP),
                        axis=1,
                    )
                    pos = jnp.minimum(pos, pa)
                vals.append(m1)
                poss.append(pos)
                for a in range(g):
                    work[a] = jnp.where(
                        lanes + a * WLANE == pos[:, None], jnp.inf, work[a]
                    )
            rows = list(vals)
            for t in range(0, n_top, 2):
                p0 = poss[t]
                p1 = poss[t + 1] if t + 1 < n_top else jnp.zeros_like(p0)
                rows.append((p0 + out_w * p1).astype(jnp.float32))
            SUB = topm_ref.shape[1]
            si = jax.lax.broadcasted_iota(jnp.int32, (SUB, Bt), 0)
            packed = jnp.full((SUB, Bt), jnp.inf, jnp.float32)
            for r, v in enumerate(rows):
                packed = jnp.where(si == r, v[None, :], packed)
            topm_ref[0] = packed

    return kernel


def _window_mins(qh, qres, data_t, resid_t, rscale_row, scale_row, bias_row, *,
                 q_tile, g, transposed=False, emit_block_mins=False,
                 emit_topm=0, skip_wm=False, qe=None, eb_rows=()):
    """qh/qres [B, Dp] (metric factor pre-folded; qres = compensation residual or
    None), data_t [Dp, cap] sweep layout -> window-min positions
    [B, cap // (R1MAX//g)].  resid_t [Dp, cap] int8 + rscale_row [1, cap]: optional
    residual-correction operands (see _sweep_kernel).

    ``qe`` [B, 128] f32 + ``eb_rows`` (up to two [1, cap] f32 rows in sweep column
    order): per-query scales and per-row certificate error bounds folded into the
    emitted mins — see _sweep_kernel's n_eb.  The mins are then the certificate's
    optimistic bounds directly.

    ``transposed``: emit [nt, B, out_w] (tile-major) instead of [B, nt*out_w].
    The [B, P] form writes each tile's mins as q_tile rows of out_w*4-byte chunks
    strided P*4 apart — at DEEP shape (nt=2048) that strided DMA drags the sweep
    to ~636 GB/s vs 814 at nt=256 (probe_sel_itemize).  Tile-major blocks are one
    contiguous q_tile*out_w*4-byte store per grid step, and the two-level selection
    consumes the layout natively: window position p = (t*g + a)*WLANE + lane."""
    Dp, cap = data_t.shape
    B = qh.shape[0]
    out_w = g * WLANE
    two_pass = qres is not None
    use_resid = resid_t is not None
    n_eb = len(eb_rows)
    if n_eb and (qe is None or qe.shape != (B, 128)):
        raise ValueError("eb_rows needs qe [B, 128] per-query scales")
    nt = cap // SWEEP_TILE
    grid = (nt, B // q_tile)  # db outermost: one HBM sweep total
    resid_bytes = cap * (Dp + 4) if use_resid else 0
    if emit_block_mins and not (transposed and g == 1):
        raise ValueError("emit_block_mins requires the transposed g=1 layout")
    if emit_topm and (emit_block_mins or not transposed):
        raise ValueError("emit_topm requires the transposed layout (and no bm)")
    if skip_wm and not emit_topm:
        raise ValueError("skip_wm needs the top-m pool as the remaining output")
    if skip_wm:
        # pool-only emission: the window-min matrix is never materialized
        SUB = _topm_sub_rows(emit_topm)
        out_shape = jax.ShapeDtypeStruct((nt, SUB, B), jnp.float32)
        out_specs = pl.BlockSpec(
            (1, SUB, q_tile), lambda di, qi: (di, 0, qi), memory_space=pltpu.VMEM
        )
    elif transposed:
        out_shape = jax.ShapeDtypeStruct((nt, B, out_w), jnp.float32)
        out_specs = pl.BlockSpec(
            (1, q_tile, out_w), lambda di, qi: (di, qi, 0), memory_space=pltpu.VMEM
        )
        if emit_block_mins:
            # second output: per-tile block mins, min over the tile's out_w
            # window-mins, broadcast over 8 sublanes (Mosaic block-shape rule);
            # consumers read [:, 0, :].T -> [B, nt]
            out_shape = [out_shape, jax.ShapeDtypeStruct((nt, 8, B), jnp.float32)]
            out_specs = [
                out_specs,
                pl.BlockSpec((1, 8, q_tile), lambda di, qi: (di, 0, qi),
                             memory_space=pltpu.VMEM),
            ]
        elif emit_topm:
            # second output: per-tile top-m window-min candidates (values +
            # packed positions; see _sweep_kernel n_top)
            SUB = _topm_sub_rows(emit_topm)
            out_shape = [out_shape, jax.ShapeDtypeStruct((nt, SUB, B), jnp.float32)]
            out_specs = [
                out_specs,
                pl.BlockSpec((1, SUB, q_tile), lambda di, qi: (di, 0, qi),
                             memory_space=pltpu.VMEM),
            ]
    else:
        out_shape = jax.ShapeDtypeStruct((B, nt * out_w), jnp.float32)
        out_specs = pl.BlockSpec(
            (q_tile, out_w), lambda di, qi: (qi, di), memory_space=pltpu.VMEM
        )
    return pl.pallas_call(
        _sweep_kernel(g, scale_row is not None, two_pass, use_resid, n_eb,
                      emit_topm, skip_wm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, Dp), lambda di, qi: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, Dp), lambda di, qi: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, SWEEP_TILE), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (Dp, SWEEP_TILE) if use_resid else (1, SWEEP_TILE),
                lambda di, qi: (0, di),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, SWEEP_TILE), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SWEEP_TILE), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SWEEP_TILE), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 128), lambda di, qi: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SWEEP_TILE), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SWEEP_TILE), lambda di, qi: (0, di), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * cap * Dp * ((2 if two_pass else 1) + (1 if use_resid else 0)),
            bytes_accessed=cap * Dp * data_t.dtype.itemsize + resid_bytes
            + n_eb * cap * 4
            + (0 if skip_wm else B * nt * out_w * 4)
            + (nt * 8 * B * 4 if emit_block_mins else 0)
            + (nt * _topm_sub_rows(emit_topm) * B * 4 if emit_topm else 0),
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        qh,
        qres if qres is not None else qh,
        data_t,
        resid_t if use_resid else bias_row,
        rscale_row if use_resid else bias_row,
        scale_row if scale_row is not None else bias_row,
        bias_row,
        qe if n_eb else qh,  # dummy block: never read when n_eb == 0
        eb_rows[0] if n_eb >= 1 else bias_row,
        eb_rows[1] if n_eb >= 2 else bias_row,
    )


# ------------------------------------------------------------------ phase 2 selection

def _pos_to_window(p, g: int):
    """Output position -> fine window id (see module docstring layout)."""
    gw = g * WLANE
    t = p // gw
    rem = p - t * gw
    a = rem // WLANE
    j = rem - a * WLANE
    return (t * WLANE + j) * g + a


def _sorted_topk(x, kk: int):
    """(values, positions) of the kk smallest per row via ONE bitonic pair-sort.

    XLA's top_k on TPU costs ~O(W*k) (iterative selection), which at k~1000 dwarfs
    the O(W log^2 W) bitonic sort — measured in the round-3 probes, top_k [B, 2k]
    -> k at k=1000 alone cost milliseconds.  Large-k selections therefore sort
    (value, index) pairs once and slice."""
    B, W = x.shape
    iota = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (B, W))
    sv, si = jax.lax.sort((x, iota), dimension=-1, num_keys=1)
    return sv[:, :kk], si[:, :kk]


# k at or above which selections pair-sort instead of top_k (see _sorted_topk);
# overridable for perf exploration (read once at import)
import os as _os

SORT_TOPK_FROM = int(_os.environ.get("MLVDB_SORT_TOPK_FROM", "257"))

# top-m candidate-pool selection (see _sweep_kernel n_top); trace-time gate so
# perf probes can A/B pool vs window-min selection within one process
TOPM_ENABLE = _os.environ.get("MLVDB_TOPM", "1") != "0"

# rescan width (s1*r1 candidate rows) at or above which the gather+score runs in
# lax.map chunks instead of one monolithic pass (see _rescan_windows); trace-time
RESCAN_CHUNK_FROM = int(_os.environ.get("MLVDB_RESCAN_CHUNK_FROM", "2048"))

# block-top refine for wide certified selections (see _select_and_rescan): each
# selected level-2 block yields its MB smallest windows by iterated min/argmin
# instead of one chunked top_k over [B, s2*r2]; MB=8 puts the hidden-window
# escalation odds at ~1e-3/batch under the W2 >= 4*s gate
BLOCKTOP_ENABLE = _os.environ.get("MLVDB_BLOCKTOP", "1") != "0"
MB_BLOCKTOP = int(_os.environ.get("MLVDB_BLOCKTOP_M", "8"))

# allow the top-m pool on block-min-eligible shapes (k<=32, r1=32) — off by
# default (the bm wmin selection serves there); probes flip it per call to A/B
# the two in one process now that tuning is a static jit arg
TOPM_BM = _os.environ.get("MLVDB_TOPM_BM", "0") != "0"

# per-query contained escalation (see _fused_t): on by default; the knob exists
# to bisect its compile-time cost per program
CONTAIN_ENABLE = _os.environ.get("MLVDB_CONTAIN", "1") != "0"


def _topk_min(x, kk: int):
    """Smallest-kk (values, positions): top_k for small kk, pair-sort for large."""
    if kk >= SORT_TOPK_FROM and x.shape[1] > kk:
        return _sorted_topk(x, kk)
    neg, i = jax.lax.top_k(-x, kk)
    return -neg, i


def _topk_spec(x, kk: int):
    """(values, idx, floor) of kk smallest entries per row of x [B, W].

    XLA top_k cost grows ~W*k, so wide selections run CHUNKED: per-chunk top-kc with
    a SMALL speculative kc (expected chunk occupancy + slack), then one narrow merge.
    Speculation can miss elements when a chunk holds more than kc of the global
    top-kk; ``floor`` [B] makes that SOUND for the exactness certificate: every
    element NOT returned is >= min(floor, values[:, -1]) — floor is the min over
    chunks of each chunk's kc-th smallest (+inf on the exact paths, where nothing
    below values[:, -1] can be missing).  A genuine miss drops floor below the
    certificate's bar and escalates the tier instead of returning a wrong result."""
    B, W = x.shape
    CH = 2048
    if W <= max(kk, 4096):
        v, i = _topk_min(x, min(kk, W))
        return v, i, jnp.full((B,), jnp.inf, jnp.float32)

    Wp = -(-W // CH) * CH
    pad = Wp - W
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=jnp.inf)
    nch = Wp // CH
    if kk <= 64:
        kc = min(kk, CH)   # exact per chunk: no chunk can hold >kk of the top-kk
    else:
        import math

        occupancy = kk // nch + 4 * math.isqrt(max(kk // nch, 1)) + 16
        guarantee = (kk + pad + nch - 1) // nch  # merged real candidates >= kk
        kc = min(CH, max(occupancy, guarantee))
    v, i = jax.lax.top_k(-x.reshape(B * nch, CH), kc)
    vch = (-v).reshape(B, nch, kc)
    iglob = (
        i.reshape(B, nch, kc) + (jnp.arange(nch, dtype=jnp.int32) * CH)[None, :, None]
    ).reshape(B, nch * kc)
    v2, p = _topk_min(vch.reshape(B, nch * kc), kk)
    idx = jnp.minimum(jnp.take_along_axis(iglob, p, axis=1), W - 1)
    if kc < kk:  # speculative: unreturned elements are >= their chunk's kc-th
        floor = jnp.min(vch[:, :, -1], axis=1)
    else:
        floor = jnp.full((B,), jnp.inf, jnp.float32)
    return v2, idx, floor


def _flat_rows(mat3, idx):
    """Flat 2-D row gather: mat3 [B, W, C] rows selected by idx [B, s] -> [B, s, C].

    Lowars to the fast flat gather (~11 ns/row) instead of the 3-4x slower 3-D
    take_along_axis (measured in benchmarks/explore_select.py)."""
    B, W, C = mat3.shape
    flat = mat3.reshape(B * W, C)
    gidx = idx + (jnp.arange(B, dtype=idx.dtype) * W)[:, None]
    return flat[gidx.reshape(-1)].reshape(B, idx.shape[1], C)


def _select_and_rescan(
    q32, qn_row, rescan, maskadd, hw, wmin, *, k, metric, r1, masked, s_sel=None,
    r2=R2, wmin_t=None, spec_l2=False, wmin2=None, chunk_from=None, blocktop=False,
):
    """Hierarchical window selection + exact HIGHEST rescan of contiguous windows.

    Returns ``(best_d, best_i, thresh)`` where ``thresh`` [B] is the selection
    threshold: every fine window NOT rescanned has (as-computed) window-min >= thresh.
    +inf when every window was rescanned.  The certificate in ``_fused_t`` compares
    ``thresh`` against the k-th found distance to prove no true neighbour was pruned.
    ``s_sel`` overrides the number of windows selected (the certificate escalation
    tiers pass wider widths).

    Certified callers feed window-mins that are ALREADY the certificate's
    optimistic per-row lower bounds — the sweep kernel folds the data-side error
    terms in as a rank-1 FMA (see _sweep_kernel's n_eb) — so selection here needs
    no error awareness at all: windows whose phase-1 rank is uncertain rank low
    and get rescanned exactly, and ``thresh`` is directly the optimistic-bound
    floor the proof compares against."""
    if wmin_t is not None:
        # tile-major transposed window mins [nt, B, out_w] (any r2 dividing out_w):
        # block blk = t*g + a covers lanes [a*WLANE, (a+1)*WLANE) of tile t, i.e.
        # window positions [blk*WLANE, (blk+1)*WLANE) — identical block indexing to
        # the [B, P] reshape, so every position/threshold formula below is shared.
        nt, B, out_w = wmin_t.shape
        P = nt * out_w
    else:
        B, P = wmin.shape
    g = R1MAX // r1
    s = min(s_sel if s_sel is not None else min(2 * k, k + 16), P)
    two_level = P % r2 == 0 and P // r2 > 1
    if wmin_t is not None and not two_level:
        wmin = wmin_t.transpose(1, 0, 2).reshape(B, P)    # tiny P: one-pass convert
        wmin_t = None

    if two_level:
        # two-level: min-reduce to r2-blocks first — XLA top_k cost is dominated by
        # per-row width, so shrinking W before the exact top_k is the cheap path
        W2 = P // r2
        if wmin_t is not None:
            gb = out_w // r2                              # blocks per tile (= g)
            if wmin2 is None:                             # else: in-kernel epilogue
                wmin2 = (
                    wmin_t.reshape(nt, B, gb, r2).min(axis=-1)
                    .transpose(1, 0, 2).reshape(B, W2)    # [B, W2]; moves B*W2*4 B
                )
        else:
            wmin3 = wmin.reshape(B, W2, r2)
            wmin2 = wmin3.min(axis=-1)                    # [B, W2]
        s2 = min(s, W2)
        # chunked speculative selection at level 2 — CERTIFIED CALLERS ONLY: at
        # k=1000 (W2=8192, s2=1016) the exact pair-sort costs ~1.0 ms where the
        # speculative chunked top_k is near-free (probe_k1000_item ALT-spec2);
        # fl2 folds into thresh so a speculation miss escalates the certificate.
        # Margin mode has NO escalation — a miss there becomes a recall miss
        # (measured: recall 0.9999 at k=1000 with speculation on), so it keeps
        # the exact selection.
        if spec_l2:
            v2, w2i, fl2 = _topk_spec(wmin2, s2)
        else:
            v2, w2i = _topk_min(wmin2, s2)
            fl2 = jnp.full((wmin2.shape[0],), jnp.inf, jnp.float32)
        # gather the selected blocks' fine windows.  128B rows gather at ~3 GB/s
        # (overhead-bound); 512B rows at ~100-148 GB/s (round-3 gather probe) — so
        # fetch >=512B SUPER-rows and slice the wanted block on-chip.  Sorted ids
        # add locality (+40% on top).
        w2i = jnp.sort(w2i, axis=1)
        if wmin_t is not None:
            # tile-major: one gathered row = one tile's out_w mins (>= 512 B,
            # contiguous by construction); slice block a = blk % gb on-chip
            flat = wmin_t.reshape(nt * B, out_w)
            gidx = (w2i // gb) * B + jnp.arange(B, dtype=w2i.dtype)[:, None]
            rows4 = flat[gidx.reshape(-1)].reshape(B, s2, gb, r2)
            if gb > 1:
                onehot = (
                    jnp.arange(gb, dtype=jnp.int32)[None, None, :]
                    == (w2i % gb)[:, :, None]
                )
                l1_blk = jnp.sum(jnp.where(onehot[..., None], rows4, 0.0), axis=2)
            else:
                l1_blk = rows4.reshape(B, s2, r2)
        else:
            G = max(1, 512 // (r2 * 4))                   # super-row >= 512 B
            if G > 1 and W2 % G == 0:
                sup = w2i // G
                mat = wmin.reshape(B * (W2 // G), G * r2)
                gidx = sup + (jnp.arange(B, dtype=sup.dtype) * (W2 // G))[:, None]
                rows4 = mat[gidx.reshape(-1)].reshape(B, s2, G, r2)
                # slice the wanted block out with a DENSE masked reduction, not
                # take_along_axis — the minor-axis gather costs 5.2 ms at k=1000
                # shapes where the elementwise mask+sum costs 0.1 ms (measured)
                onehot = (
                    jnp.arange(G, dtype=jnp.int32)[None, None, :]
                    == (w2i % G)[:, :, None]
                )
                l1_blk = jnp.sum(jnp.where(onehot[..., None], rows4, 0.0), axis=2)
            else:
                l1_blk = _flat_rows(wmin3, w2i)           # [B, s2, r2]
        # BLOCK-TOP refine (certified only): at k=1000 widths the level-1 stage —
        # chunked speculative top_k over [B, s2*r2 ~ 36K] — is the single most
        # expensive selection piece (~2-3 ms of the measured 3.5-3.9 ms refine).
        # Each selected block instead yields its MB smallest windows by MB rounds
        # of min/argmin/mask over the minor axis (pure VPU elementwise), and one
        # narrow top-s1 runs on the [B, s2*MB] candidates.  SOUND under the
        # certificate only: a block hiding more than MB hot windows lowers
        # block_floor (min over blocks of each block's MB-th min) below the k-th
        # found rank and the batch escalates — with hot windows ~Poisson(s/W2)
        # per block, the W2 >= 4*s gate puts that at P(>=8) ~ 1e-3 per batch.
        use_bt = blocktop and spec_l2 and s >= 512 and MB_BLOCKTOP < r2 and W2 >= 4 * s
        if use_bt:
            MB = MB_BLOCKTOP
            iota_r = jnp.arange(r2, dtype=jnp.int32)
            work = l1_blk
            vals, poss = [], []
            for _ in range(MB):
                m1 = work.min(axis=2)                     # [B, s2]
                pm = jnp.min(
                    jnp.where(work == m1[..., None], iota_r, r2), axis=2
                )
                # NaN rows match no lane: pm stays at the r2 sentinel — clamp so
                # the candidate decodes inside its own block (a NaN kth fails
                # check_exact and escalates regardless)
                pm = jnp.minimum(pm, r2 - 1)
                vals.append(m1)
                poss.append(pm)
                work = jnp.where(
                    iota_r[None, None, :] == pm[..., None], jnp.inf, work
                )
            cand_v = jnp.stack(vals, -1).reshape(B, s2 * MB)
            cand_p = (
                w2i[:, :, None] * r2 + jnp.stack(poss, -1)
            ).reshape(B, s2 * MB)
            s1 = min(s, s2 * MB)
            v1, sel = _topk_min(cand_v, s1)
            p = jnp.take_along_axis(cand_p, sel, axis=1)
            block_floor = vals[-1].min(axis=1)            # [B] MB-th mins' min
            thresh = jnp.minimum(fl2, block_floor)
            if s2 < W2:
                thresh = jnp.minimum(thresh, v2[:, -1])
            if s1 < s2 * MB:
                thresh = jnp.minimum(thresh, v1[:, -1])
        else:
            s1 = min(s, s2 * r2)
            l1_vals = l1_blk.reshape(B, s2 * r2)
            v1, pos, floor = _topk_spec(l1_vals, s1)
            w2sel = jnp.take_along_axis(w2i, pos // r2, axis=1)
            p = w2sel * r2 + pos % r2                     # output positions
            # unselected blocks >= s2-th block-min; unselected windows inside
            # selected blocks >= min(s1-th value, speculative floor)
            thresh = fl2                                  # level-2 speculation floor
            if s2 < W2:
                thresh = jnp.minimum(thresh, v2[:, -1])
            if s1 < s2 * r2:
                thresh = jnp.minimum(thresh, v1[:, -1])
            thresh = jnp.minimum(thresh, floor)
    else:
        s1 = min(s, P)
        v1, p, floor = _topk_spec(wmin, s1)
        thresh = floor if s1 >= P else jnp.minimum(v1[:, -1], floor)

    f = _pos_to_window(p, g)                              # [B, s1] fine windows
    best_d, best_i = _rescan_windows(
        q32, qn_row, rescan, maskadd, hw, f, k=k, metric=metric, r1=r1,
        masked=masked, chunk_from=chunk_from,
    )
    return best_d, best_i, thresh


def _rescan_windows(q32, qn_row, rescan, maskadd, hw, f, *, k, metric, r1, masked,
                    chunk_from=None):
    """Exact HIGHEST-precision rescan of the selected fine windows ``f`` [B, s1]:
    contiguous r1-row gathers + fused VPU scoring + final top-k."""
    B, s1 = f.shape
    # ascending store order adds DMA locality to the rescan gather (sorted ids
    # measured +40% in the round-3 gather probe); the final top-k re-ranks, so
    # candidate order is free
    f = jnp.sort(f, axis=1)
    cap, Dp = rescan.shape
    # contiguous window gather: one r1-row (r1*Dp*itemsize bytes) DMA per window
    dataw = rescan.reshape(cap // r1, r1 * Dp)

    def _score(fc):
        """Gather + exact-score one candidate-window chunk [B, sc] -> dist, rows."""
        sc = fc.shape[1]
        sub = dataw[fc.reshape(-1)].reshape(B, sc * r1, Dp).astype(jnp.float32)
        rws = (fc[:, :, None] * r1 + jnp.arange(r1, dtype=jnp.int32)).reshape(B, sc * r1)
        # VPU mul+reduce, NOT a batched dot_general: the per-query matvec is
        # MXU-hostile ([B, s*r1, D] x [B, D] forces an operand-layout transpose
        # that XLA fuses into the gather — measured 3.2 ms vs 1.8 for the fused
        # elementwise form at k=1000 widths, probe_rescan_form), and the
        # mul-reduce shares one pass over ``sub`` with the norm reduction.  f32
        # tree-reduce accumulation error is within the certificate's Dp * 2^-22
        # slack.
        dots = jnp.sum(sub * q32[:, None, :], axis=-1)    # [B, sc*r1]
        sqn_c = jnp.sum(sub * sub, axis=-1)               # norms from the rows
        if metric == "l2":
            dd = jnp.maximum(qn_row + sqn_c - 2.0 * dots, 0.0)
        elif metric == "ip":
            dd = 1.0 - dots
        else:
            denom = jax.lax.rsqrt(jnp.maximum(qn_row * sqn_c, 1e-30))
            dd = 1.0 - dots * denom
        if masked:
            dd = dd + maskadd[rws]
        else:
            dd = jnp.where(rws < hw, dd, MASKED)          # arithmetic tail mask
        return dd, rws

    # wide rescans score in chunks (lax.map) to bound the live gathered-sub
    # buffer: the monolithic form keeps B*s1*r1*Dp*4 bytes (~266 MB at k=1000)
    # live across the whole gather+score, and XLA schedules it ~1.6 ms slower
    # than 8 sequential chunks (probe_insitu R5 vs P0) — chunking costs nothing
    # on exactness (same rows, same arithmetic).  s1 pads to a chunkable width;
    # pad slots repeat window 0 and are masked to MASKED below so duplicates
    # can never enter the top-k.
    if chunk_from is None:
        chunk_from = RESCAN_CHUNK_FROM
    if s1 * r1 >= chunk_from:
        nch = 8
        s1p = -(-s1 // nch) * nch
        fpad = jnp.pad(f, ((0, 0), (0, s1p - s1)))
        fch = fpad.reshape(B, nch, s1p // nch).transpose(1, 0, 2)
        dist_c, rows_c = jax.lax.map(_score, fch)         # [nch, B, (s1p/nch)*r1]
        dist = dist_c.transpose(1, 0, 2).reshape(B, s1p * r1)
        rows = rows_c.transpose(1, 0, 2).reshape(B, s1p * r1)
        if s1p != s1:
            pad_slot = jnp.arange(s1p * r1, dtype=jnp.int32) >= s1 * r1
            dist = jnp.where(pad_slot[None, :], MASKED, dist)
    else:
        dist, rows = _score(f)

    kk = min(k, dist.shape[1])
    best_d, pk = _topk_min(dist, kk)
    best_i = jnp.take_along_axis(rows, pk, axis=1).astype(jnp.int32)
    if kk < k:
        best_d = jnp.pad(best_d, ((0, 0), (0, k - kk)), constant_values=float(MASKED))
        best_i = jnp.pad(best_i, ((0, 0), (0, k - kk)))
    return best_d, best_i


def _select_topm_and_rescan(
    q32, qn_row, rescan, maskadd, hw, topm, *, k, metric, r1, masked, s_sel, m,
    chunk_from=None,
):
    """Selection from the sweep kernel's per-tile top-m candidate pool
    (_sweep_kernel n_top) + the shared exact rescan.

    The pool holds each tile's m smallest optimistic window-mins with their
    positions; selection is ONE narrow top-s over [B, nt*m] — no level-2
    reduce, no tile-row gather, no wide level-1 top_k.  Soundness (certified
    callers only): a window never rescanned is either (a) in the pool but not
    selected — >= the s-th selected value — or (b) outside its tile's top-m —
    >= that tile's m-th min >= the pool floor; both fold into ``thresh``, so
    a tile hiding more than m true candidates escalates the certificate
    instead of corrupting the result."""
    nt, SUB, B = topm.shape
    g = R1MAX // r1
    out_w = g * WLANE
    pool = nt * m
    tm = topm.transpose(2, 0, 1)                          # [B, nt, SUB]
    vals = tm[:, :, :m].reshape(B, pool)
    npack = (m + 1) // 2
    pk = tm[:, :, m : m + npack].astype(jnp.int32)        # exact: < out_w^2 <= 2^24
    pos2 = jnp.stack([pk % out_w, pk // out_w], axis=-1)  # [B, nt, npack, 2]
    pos_in_tile = pos2.reshape(B, nt, 2 * npack)[:, :, :m]
    win = (
        jnp.arange(nt, dtype=jnp.int32)[None, :, None] * out_w + pos_in_tile
    ).reshape(B, pool)                                    # output positions
    s1 = min(s_sel, pool)
    tile_floor = jnp.min(vals.reshape(B, nt, m)[:, :, m - 1], axis=1)  # [B]
    if s1 >= SORT_TOPK_FROM:
        sv, sw = jax.lax.sort((vals, win), dimension=-1, num_keys=1)
        v1, p = sv[:, :s1], sw[:, :s1]
    else:
        v1, ci = _topk_min(vals, s1)
        p = jnp.take_along_axis(win, ci, axis=1)
    thresh = tile_floor if s1 >= pool else jnp.minimum(v1[:, -1], tile_floor)
    f = _pos_to_window(p, g)
    best_d, best_i = _rescan_windows(
        q32, qn_row, rescan, maskadd, hw, f, k=k, metric=metric, r1=r1,
        masked=masked, chunk_from=chunk_from,
    )
    return best_d, best_i, thresh


# ------------------------------------------------------------------ fused program

def _cert_plan(*, certify, light, mixed, lossy_sweep, int8_sweep, use_resid,
               has_sweep_err, has_err1, metric):
    """Static certificate plan — the ONE source of truth for which error terms the
    proof carries (both the inline path and the snapshot-cached prep path build
    from this; see _prep_terms).

    Returns ``(wb_sources, q_tags, err_tags)``:
      * wb_sources: per-window bound arrays to build, each a name resolved by
        _prep_terms ("sweep_err" | "err1" | "sqn_sqrt").
      * q_tags: the per-query scale paired with each wb entry ("qh" -> |q_fold|,
        "qres" -> |q_fold - bf16(q_fold)|).
      * err_tags: scalar error composition beyond the f32 accumulation slack —
        "qres" adds the per-query residual norm (cosine folds the data norm away);
        ("rel", x) adds the worst-case elementwise band x * |qh| * maxd.
    """
    if not certify:
        return (), (), ()
    if not mixed:
        if lossy_sweep:
            # same-dtype lossy sweep: the only phase-1/rescan mismatch is the
            # query's own rounding — |qres . d| <= |qres| * ||d|| per window
            # (cosine: the norms cancel into a constant per-query shift)
            if metric == "cosine":
                return (), (), ("qres",)
            return ("sqn_sqrt",), ("qres",), ()
        return (), (), ()
    if light and (has_err1 or has_sweep_err):
        # LIGHT certified tier (single pass): RAW data band (err1 when the store
        # maintains residual arrays — its sweep_err is then the post-correction
        # band this tier does NOT earn), plus the uncompensated query rounding
        band = "err1" if has_err1 else "sweep_err"
        if metric == "cosine":
            return (band,), ("qh",), ("qres",)
        return (band, "sqn_sqrt"), ("qh", "qres"), ()
    if use_resid and has_sweep_err:
        # residual-corrected sweep: post-correction band (sweep_err, ~2^-8 of raw)
        # scaled by the FULL query + raw band (err1) scaled by the query residual
        # (the correction matmul used qh, not qh+qres)
        return ("sweep_err", "err1"), ("qh", "qres"), ()
    if has_sweep_err:
        return ("sweep_err",), ("qh",), ()
    rel = 2.0 ** -7 if int8_sweep else 2.0 ** -9
    if light:
        rel *= 2.0  # single pass: the query-side rounding is uncompensated too
    return (), (), (("rel", rel),)


def _prep_terms(valid, sq_norms, hw, rscale, rscale2, sweep_err, err1, *,
                cap, metric, masked, int8_sweep, bf_sweep, use_resid,
                wb_sources):
    """All QUERY-INDEPENDENT search prep: bias/scale rows in sweep column order,
    the residual-correction multiplier row, the live-max norm, and the certificate's
    per-window bound arrays.  At DEEP shape (8.4M rows) these permutes/reduces cost
    ~1.2 ms per call when traced inline (probe_qprep) — but they only change when
    the SNAPSHOT changes, so exact_knn_pallas_t caches this dict per published
    DeviceState (prep_cache) and the fused program takes the arrays as inputs."""
    sqn = sq_norms.astype(jnp.float32)
    if masked:
        maskadd = jnp.where(valid, 0.0, MASKED).astype(jnp.float32)
    else:
        maskadd = jnp.where(jnp.arange(cap) < hw, 0.0, MASKED)
    bias = (sqn + maskadd) if metric == "l2" else maskadd
    bias_row = sweep_rows_1d(bias).reshape(1, cap)

    if metric == "cosine":
        sfac = jax.lax.rsqrt(jnp.maximum(sqn, 1e-30))
    else:
        sfac = None
    if int8_sweep:
        # fold the per-row dequant scale into the kernel's per-column multiplier
        sfac = rscale if sfac is None else rscale * sfac
    scale_row = sweep_rows_1d(sfac).reshape(1, cap) if sfac is not None else None

    if use_resid:
        # bf16 sweep: resid codes carry their own scale in ``rscale``.  int8 PRIMARY
        # sweep: ``rscale`` is the primary dequant scale s1 (folded into scale_row
        # above), so the kernel's correction multiplier must be the RATIO s2/s1 —
        # rank = (z1.q + (z2.q)*(s2/s1)) * s1 = s1*z1.q + s2*z2.q.  s1 == 0 only for
        # all-zero/unwritten rows, whose delta is zero too.
        kr = rscale if bf_sweep else jnp.where(rscale > 0, rscale2 / rscale, 0.0)
        rscale_row = sweep_rows_1d(kr).reshape(1, cap)
    else:
        rscale_row = None

    live = maskadd < 1.0
    maxd = jnp.sqrt(jnp.max(jnp.where(live, sqn, 0.0)))

    def eb_row(row_norms):
        """Per-row error norms -> a [1, cap] bound row in SWEEP COLUMN order,
        ready for the in-kernel optimistic fold (_sweep_kernel's n_eb)."""
        e = row_norms
        if metric == "cosine":
            e = e * jax.lax.rsqrt(jnp.maximum(sqn, 1e-30))
        e = jnp.where(live, e, 0.0)                       # dead rows rank as +inf anyway
        return sweep_rows_1d(e).reshape(1, cap).astype(jnp.float32)

    srcs = {"sqn_sqrt": lambda: jnp.sqrt(sqn),
            "sweep_err": lambda: sweep_err,
            "err1": lambda: err1}
    eb_rows = tuple(eb_row(srcs[s]()) for s in wb_sources)
    return {"bias_row": bias_row, "scale_row": scale_row, "rscale_row": rscale_row,
            "maxd": maxd, "eb_rows": eb_rows}


_prep_terms_jit = jax.jit(
    _prep_terms,
    static_argnames=("cap", "metric", "masked", "int8_sweep", "bf_sweep",
                     "use_resid", "wb_sources"),
)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "r1", "masked", "q_tile", "certify", "light",
                     "use_resid", "wb_sources", "q_tags", "err_tags", "tuning"),
)
def _fused_t(
    q, data_t, rescan, valid, sq_norms, hw, sweep_err=None,
    resid=None, rscale=None, err1=None, rscale2=None, prep=None,
    *, k, metric, r1, masked, q_tile, certify=True, light=False,
    use_resid=False, wb_sources=(), q_tags=(), err_tags=(),
    tuning=None,
):
    """The whole search — prep, sweep, selection, rescan — as ONE dispatched program.

    ``prep``: optional precomputed query-independent terms (_prep_terms) — the
    caller caches them per published snapshot; when None they trace inline (same
    program as before, for direct/sharded callers without a snapshot)."""
    Dp, cap = data_t.shape
    g = R1MAX // r1
    # tuning = (topm_enable, rescan_chunk_from): STATIC jit args, not trace-time
    # globals — jax.jit caches on static args + avals only, so a probe toggling
    # the module globals between calls would silently get the FIRST-traced
    # program back (this confounded the round-4 pool-vs-wmin A/Bs; the
    # round-5 bisect caught it when the "pool" fused number matched wmin
    # exactly while the pool phase-1 alone measured 19.7 ms).
    (topm_enable, rescan_chunk_from, bt_enable, topm_bm, contain_enable) = (
        tuning if tuning is not None
        else (TOPM_ENABLE, RESCAN_CHUNK_FROM, BLOCKTOP_ENABLE, TOPM_BM,
              CONTAIN_ENABLE))
    q32 = q.astype(jnp.float32)
    qn_row = jnp.sum(q32 * q32, axis=-1)

    bf_sweep = data_t.dtype == jnp.bfloat16
    int8_sweep = data_t.dtype == jnp.int8
    lossy_sweep = bf_sweep or int8_sweep
    if prep is None:
        prep = _prep_terms(
            valid, sq_norms, hw, rscale, rscale2, sweep_err, err1,
            cap=cap, metric=metric, masked=masked,
            int8_sweep=int8_sweep, bf_sweep=bf_sweep, use_resid=use_resid,
            wb_sources=wb_sources,
        )
    bias_row, scale_row, rscale_row = prep["bias_row"], prep["scale_row"], prep["rscale_row"]

    if metric == "l2":
        q_fold = -2.0 * q32
    else:  # ip/cosine: rank by -dots[/|d|] (+mask); 1/|q| is a per-query constant
        q_fold = -q32

    # compensated query for MIXED lossy sweeps: qh + qres represents q_fold to
    # ~2^-18 relative, so the certificate's query-rounding term vanishes (the second
    # VMEM matmul reads the block from VMEM — MXU time only).  int8 sweeps dot the
    # bf16 query against bf16-cast codes (exact for integers <= 127).  SAME-dtype
    # sweeps (bf16 store + mirror, the DEEP config) skip the second pass and carry
    # the query-rounding term per window instead (see _cert_plan).
    mixed = (bf_sweep and rescan.dtype != data_t.dtype) or int8_sweep
    op_dtype = jnp.bfloat16 if int8_sweep else data_t.dtype
    qh = q_fold.astype(op_dtype)
    qres_f32 = q_fold - qh.astype(jnp.float32)
    # ``light``: single-pass certified tier — skip the query-compensation matmul AND
    # the residual stream; the certificate carries the uncompensated query-rounding
    # term + RAW data band per window (_cert_plan).  On benign corpora tier-1 still
    # certifies at one MXU pass / no resid bytes; adversarial corpora escalate
    # (speed, never correctness) — the engine's adaptive dispatch then switches the
    # namespace to the heavy program (engine/query_processor._pick_light).
    qres = qres_f32.astype(op_dtype) if (lossy_sweep and mixed and not light) else None

    # level-2 block width: tiny-k selections use WLANE(=128)-blocks — a 4x
    # narrower level-2 top_k; k=100 measured 0.5 ms faster with 32-blocks
    # (probe_sel_itemize r2 sweep: the L1 stage's width is s2 * r2, which must
    # stay near s2 * 32 once s2 ~ k).  k <= 128 also switches the sweep output to
    # the tile-major transposed layout: contiguous 64 KB stores per grid step
    # instead of strided out_w-chunk rows (the strided form costs ~0.9 ms of
    # sweep bandwidth at DEEP shape); the tile-row gather slices any r2 | out_w.
    P_all = cap // r1

    # tier-1 selection width (also gates the top-m pool): the margin above k
    # must scale with k because window-min quantile spacing tightens deeper
    # into the distance distribution.  With per-window optimistic-bound
    # selection, uncertain windows are pulled into the rescan by construction,
    # so the certified width carries no global error allowance — except the
    # worst-case-band plans, which widen.
    if not certify:
        s1_w = min(2 * k, k + 16)
    elif any(isinstance(t, tuple) for t in err_tags):
        s1_w = max(64, 2 * k + 48)  # worst-case global band: widen tier-1
    else:
        s1_w = min(2 * k, k + 16 + k // 8)
    s1_w = min(s1_w, P_all)

    # per-tile top-m candidate epilogue (certified only: its floor needs the
    # escalation path).  m scales with k so the per-tile pool covers the
    # selection width with slack — the floor fails when one tile holds MORE
    # than m of the windows at or above the k-th found rank.  Selected windows
    # land ~Poisson(s1_w/nt) per tile, so the gate requires m >= 4x that mean:
    # measured on gaussian, 2x slack escalates (k=100 @ nt=32, k=1000 @ nt=128
    # flip tier-1) while 4x certifies tier-0.  m RAISES (in packed pairs, cap
    # 32 — each +1 m is one more in-kernel min/argmin round across g groups)
    # until the pool covers 4x the width: this is what admits k=1000-class
    # widths (nt=256 needs m=18) — the pool then replaces the level-2 reduce +
    # refine + wide L1 top_k that dominated k=1000's 11.8 ms.  The
    # packed-position encode needs out_w^2 <= 2^24 (f32-exact integers).
    m_base = 8 if k <= 128 else 16
    nt_all = cap // SWEEP_TILE
    m_need = -(-4 * s1_w // max(nt_all, 1))
    m_top = max(m_base, -(-m_need // 2) * 2)
    out_w_all = g * WLANE
    # block-min-eligible configs (k<=16: r1=32 -> g=1, r2=WLANE) keep the wmin
    # selection + in-kernel level-2 epilogue — measured faster than the pool
    # there (probe_topm k=10: wmin 1.48 ms vs pool 1.61 same-process); the pool
    # wins the mid-k band (k=100: 2.19 vs 2.34 ms)
    bm_eligible = k <= 32 and r1 == R1MAX and P_all % WLANE == 0 and P_all // WLANE > 1
    use_topm = (
        certify
        and topm_enable
        and (topm_bm or not bm_eligible)
        and P_all % WLANE == 0
        and nt_all > 1
        # epilogue cost is ~m_top sequential rounds of cross-lane min/argmin/mask
        # over g groups: measured on the real chip at k=1000 shape (g=8), m=16
        # makes phase-1 16.9 ms and m=18 19.7 ms vs 0.85 plain — a 20x sweep
        # slowdown the pool can never repay.  m*g <= 32 keeps the measured-good
        # band (k=100: m=8, g=2) and rules the k=1000-class configs out
        # (benchmarks/probe_k1000_bisect2.py).
        and m_top * g <= 32
        and nt_all * m_top >= 4 * s1_w
        and out_w_all * out_w_all <= (1 << 24)
    )
    transposed = (k <= 128 or use_topm) and P_all % WLANE == 0 and P_all // WLANE > 1
    use_topm = use_topm and transposed
    r2 = WLANE if (transposed and k <= 32) else R2
    # g=1 + 128-wide blocks: the sweep kernel emits the level-2 block mins in an
    # epilogue (4 KB/tile store), replacing the XLA reduce's full re-read of the
    # window-min matrix (~0.2-0.6 ms at DEEP shape).  The top-m epilogue
    # supersedes it on certified programs.
    emit_bm = transposed and r2 == WLANE and g == 1 and not use_topm
    # tier-2 (8x wider selection on the window-min matrix) only exists while its
    # gather traffic stays under the exact scan's stream (see the dispatch at the
    # bottom); when the pool serves tier 1 AND tier 2 is ruled out, the window-min
    # matrix has no consumer at all — skip emitting it (saves the 134 MB write at
    # 1M/r1=4 and frees XLA from scheduling the rescan under that live buffer)
    s2_w = min(8 * s1_w, P_all)
    tier2_exists = s2_w > s1_w and q.shape[0] * s2_w * r1 <= cap
    skip_wm = use_topm and not tier2_exists

    # -------- exactness certificate (ADVICE r2: a fixed selection margin is not a
    # bound when phase 1 ranks on rounded inputs).  The sweep kernel emits
    # OPTIMISTIC window-mins directly: each column's rank is lowered by its own
    # per-row data-side error bound scaled per query (rank-1 FMA, n_eb terms), a
    # sound lower bound on the window's true full-precision min rank.  Every fine
    # window NOT rescanned has optimistic bound >= thresh, hence true min rank
    # >= thresh - slack: if that clears the k-th FOUND rank, no pruned window can
    # hold a closer row and the result is provably exact.  Failure escalates per
    # batch: a wider selection tier (reusing the same wmin — selection and rescan
    # only), then a full-precision exact scan.  Correctness never depends on an
    # empirical margin; the tiers only set how fast the common case is.  The
    # error-term composition is decided statically by _cert_plan
    # (wb_sources/q_tags/err_tags) and the per-row bound rows live in ``prep``
    # — see _prep_terms for the terms themselves.
    q_l2 = jnp.sqrt(qn_row)                               # [B]
    qh_l2 = q_l2 * (2.0 if metric == "l2" else 1.0)       # |q_fold|
    maxd = prep["maxd"]
    # worst-case f32 accumulation: <= Dp * 2^-24 relative to |qh||d| per dot, on both
    # the phase-1 and rescan sides; 4x headroom (2^-22 covers Dp <= 512)
    slack = (Dp * 2.0 ** -22) * qh_l2 * (1.0 if metric == "cosine" else maxd)
    qres_l2 = jnp.sqrt(jnp.sum(qres_f32 * qres_f32, axis=-1))
    q_scales = {"qh": qh_l2, "qres": qres_l2}
    eb_rows = tuple(prep["eb_rows"])
    if eb_rows:
        qe = jnp.pad(
            jnp.stack([q_scales[t] for t in q_tags], axis=1),
            ((0, 0), (0, 128 - len(eb_rows))),
        )
    else:
        qe = None
    err = slack
    for t in err_tags:
        if t == "qres":
            err = err + qres_l2
        else:  # ("rel", x): worst-case elementwise band; tier-1 widens to compensate
            err = err + t[1] * qh_l2 * (1.0 if metric == "cosine" else maxd)

    def check_exact(best_d, thresh, sel=None):
        # [Bq] bool; must not shadow the `certify` param.  ``sel`` [Bq] selects a
        # query sub-batch (the contained-escalation tier re-proves only the
        # queries whose tier-1 certificate failed).
        qn = qn_row if sel is None else qn_row[sel]
        ql = q_l2 if sel is None else q_l2[sel]
        e = err if sel is None else err[sel]
        kth = best_d[:, k - 1]
        if metric == "l2":
            kth_rank = kth - qn                           # dist = qn + rank
        elif metric == "ip":
            kth_rank = kth - 1.0                          # dist = 1 + rank
        else:
            kth_rank = (kth - 1.0) * ql                   # dist = 1 + rank/|q|
        kth_real = kth < float(MASKED) / 2
        # thresh == +inf: every window was rescanned — exact regardless of fill
        return jnp.where(kth_real, thresh - e >= kth_rank, jnp.isinf(thresh))

    wm = _window_mins(
        qh, qres, data_t, resid if use_resid else None, rscale_row,
        scale_row, bias_row, q_tile=q_tile, g=g, transposed=transposed,
        emit_block_mins=emit_bm, emit_topm=m_top if use_topm else 0,
        skip_wm=skip_wm, qe=qe, eb_rows=eb_rows,
    )
    wmin2_pre = None
    topm = None
    if skip_wm:
        topm, wm = wm, None                               # pool is the only output
    elif emit_bm:
        wm, wm2raw = wm
        wmin2_pre = wm2raw[:, 0, :].T                     # [B, nt] block mins
    elif use_topm:
        wm, topm = wm                                     # [nt, SUB, B] candidates
    wmin, wmin_t = (None, wm) if transposed else (wm, None)

    # the rescan's tombstone mask (masked variant only; the unmasked path uses the
    # arithmetic rows < hw tail mask, so prep needs no maskadd array at all)
    maskadd = jnp.where(valid, 0.0, MASKED).astype(jnp.float32) if masked else None

    def tier(s_sel, from_topm=False):
        if from_topm:
            # tier 1 on the kernel's per-tile candidate pool: a tile hiding
            # more than m candidates lowers thresh (pool floor) -> escalation
            d, i, th = _select_topm_and_rescan(
                q32, qn_row[:, None], rescan, maskadd, hw, topm,
                k=k, metric=metric, r1=r1, masked=masked, s_sel=s_sel, m=m_top,
                chunk_from=rescan_chunk_from,
            )
        else:
            d, i, th = _select_and_rescan(
                q32, qn_row[:, None], rescan, maskadd, hw, wmin,
                k=k, metric=metric, r1=r1, masked=masked, s_sel=s_sel,
                r2=r2, wmin_t=wmin_t, spec_l2=certify,
                wmin2=wmin2_pre, chunk_from=rescan_chunk_from,
                blocktop=bt_enable,
            )
        return d, i, th

    s1 = s1_w
    d1, i1, th1 = tier(s1, from_topm=use_topm)
    if not certify:
        # margin-based mode (EngineConfig.certify_exact=False): return the fast tier
        # unconditionally.  Exactness then rests on the empirical selection margin +
        # the recall gates, exactly the round-2 contract — a documented speed/proof
        # trade for corpora whose neighbour gaps sit below the bf16 error band.
        return d1, i1, jnp.int32(0)

    def exact_fallback(_):
        # The terminal tier MUST be the scan backend: it is the results contract the
        # oracle tests pin set-exactly.  (A row-major Pallas fallback was tried and
        # reverted: its +16 margin can legitimately disagree with the scan at ~1e-3
        # on large-norm near-ties — f32 cancellation noise in the expanded l2 form —
        # which silently weakens the certified contract.)  Wide tiles keep the
        # scan's top_k fold count small.
        d, i = exact_knn(q32, rescan, valid, sq_norms.astype(jnp.float32),
                         k=k, metric=metric, db_tile=8 * SWEEP_TILE)
        return d, i, jnp.int32(2)

    okq = check_exact(d1, th1)                            # [B] per-query proof
    ok1 = jnp.all(okq)

    # tier-2 only earns its keep while its gather traffic (B * s2 * r1 rows) stays
    # under the exact scan's one-pass stream (cap rows for ALL queries): beyond that
    # crossover the wider selection is slower than the fallback it delays — and its
    # subgraph dominates the certified program's compile time at large k (measured:
    # the k=1000 certified program compiled 10+ minutes with it, seconds without).
    # (tier2_exists was decided above, before the sweep, so skip_wm could drop the
    # window-min emission when this branch is the one taken.)
    if not tier2_exists:
        return jax.lax.cond(
            ok1, lambda _: (d1, i1, jnp.int32(0)), exact_fallback, operand=None
        )

    def tier2_or_exact(_):
        # selection+rescan only — the HBM sweep is not repaid
        d2, i2, th2 = tier(s2_w)
        ok2 = jnp.all(check_exact(d2, th2))
        return jax.lax.cond(
            ok2, lambda _: (d2, i2, jnp.int32(1)), exact_fallback, operand=None
        )

    # CONTAINED escalation (VERDICT r4 weak #4): the proof is per query, so one
    # adversarial query in a batch need not drag every query through tier 2 —
    # when at most FQ_CONTAIN certificates failed, re-select at tier-2 width for
    # a fixed FQ-query sub-batch only (window-min rows gathered per query; the
    # rescan pays s2*r1 rows for FQ queries instead of B).  Each re-proof is the
    # same per-query certificate at the wider threshold; any residual failure
    # still falls through to the exact scan.  Poisoned-batch cost is then
    # tier-1 + an FQ/B-scale selection instead of tier-1 + full tier-2.
    FQ_CONTAIN = 8
    contain = contain_enable and q.shape[0] > FQ_CONTAIN and not skip_wm

    def contained(_):
        fail = (~okq).astype(jnp.float32)
        _, fidx = jax.lax.top_k(fail, FQ_CONTAIN)         # failing first; rest pad
        if wmin_t is not None:
            wm_s, wmt_s = None, wmin_t[:, fidx, :]
        else:
            wm_s, wmt_s = wmin[fidx], None
        d_f, i_f, th_f = _select_and_rescan(
            q32[fidx], qn_row[fidx][:, None], rescan, maskadd, hw, wm_s,
            k=k, metric=metric, r1=r1, masked=masked, s_sel=s2_w,
            r2=r2, wmin_t=wmt_s, spec_l2=True,
            wmin2=None if wmin2_pre is None else wmin2_pre[fidx],
            chunk_from=rescan_chunk_from, blocktop=bt_enable,
        )
        ok_f = jnp.all(check_exact(d_f, th_f, sel=fidx))
        d_m = d1.at[fidx].set(d_f)
        i_m = i1.at[fidx].set(i_f)
        return jax.lax.cond(
            ok_f, lambda _: (d_m, i_m, jnp.int32(1)), exact_fallback, operand=None
        )

    def escalate(_):
        if not contain:
            return tier2_or_exact(None)
        nfail = jnp.sum(~okq)
        return jax.lax.cond(
            nfail <= FQ_CONTAIN, contained, tier2_or_exact, operand=None
        )

    return jax.lax.cond(
        ok1, lambda _: (d1, i1, jnp.int32(0)), escalate, operand=None
    )


# ------------------------------------------------------------------ public entry

def _pick_r1(batch: int, n_rows: int, k: int) -> int:
    """Window width: small k wants wide windows (small window-min matrix, the
    contiguous rescan makes wide windows nearly free); large k wants narrow windows
    (rescan payload is s1*r1 rows/query).  Floor by window-min matrix memory
    (B*N*4/r1 bytes must stay bounded)."""
    if k <= 16:
        r1 = 32
    elif k <= 128:
        # measured (benchmarks/explore_select, N=1M k=100): r1=16 57.5K QPS vs
        # r1=8 40.7K — the contiguous window rescan makes the wider window cheaper
        # than the larger window-min matrix
        r1 = 16
    elif k <= 256:
        r1 = 8
    else:
        # large k: selection width s scales with k, so rescan bytes are s*r1 rows.
        # r1=4 measured fastest end-to-end at k=1000 (10.8 ms vs r1=2's 14.1 and
        # r1=8's 11.1, round-4 sel2 attribution): the smaller window-min matrix and
        # half-as-many selected windows beat the 2x rescan payload
        r1 = 4
    while r1 < R1MAX and batch * n_rows * 4 // r1 > (1 << 31):  # cap wmin at 2 GB
        r1 *= 2
    return r1


def search_prep(
    batch: int,
    data_t: jax.Array,
    rescan_dtype,
    valid: jax.Array,
    sq_norms: jax.Array,
    *,
    k: int,
    metric: str,
    live_prefix: int | None,
    certify: bool = True,
    light: bool = False,
    sweep_err: jax.Array | None = None,
    resid: jax.Array | None = None,
    rscale: jax.Array | None = None,
    err1: jax.Array | None = None,
    rscale2: jax.Array | None = None,
    r1_override: int | None = None,
) -> dict:
    """The query-independent prep dict for one (batch, k, metric, config) search —
    exactly what exact_knn_pallas_t caches per snapshot.  Compute it EAGERLY and
    pass it via ``prep=`` (threading its arrays as arguments) when calling the
    entry under an outer trace, so the traced program matches the cached-prep
    program eager serving dispatches.  ``live_prefix=None`` builds the MASKED
    variant's prep (tombstones / metadata filters): ``valid`` must then be the
    same (filter-ANDed) mask the search call will pass."""
    Dp, cap = data_t.shape
    del batch, r1_override  # prep is r1-independent since the in-kernel bound fold
    bf_sweep = data_t.dtype == jnp.bfloat16
    int8_sweep = data_t.dtype == jnp.int8
    lossy_sweep = bf_sweep or int8_sweep
    mixed = (bf_sweep and rescan_dtype != data_t.dtype) or int8_sweep
    use_resid = (
        certify and not light
        and resid is not None and rscale is not None and err1 is not None
        and (bf_sweep or (int8_sweep and rscale2 is not None))
    )
    wb_sources, _, _ = _cert_plan(
        certify=certify, light=light, mixed=mixed, lossy_sweep=lossy_sweep,
        int8_sweep=int8_sweep, use_resid=use_resid,
        has_sweep_err=sweep_err is not None, has_err1=err1 is not None,
        metric=metric,
    )
    masked = live_prefix is None
    return _prep_terms_jit(
        valid, sq_norms, jnp.int32(cap if masked else live_prefix),
        rscale, rscale2, sweep_err, err1,
        cap=cap, metric=metric, masked=masked,
        int8_sweep=int8_sweep, bf_sweep=bf_sweep, use_resid=use_resid,
        wb_sources=wb_sources,
    )


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
    sweep_err: jax.Array | None = None,
    resid: jax.Array | None = None,
    rscale: jax.Array | None = None,
    err1: jax.Array | None = None,
    rscale2: jax.Array | None = None,
    certify: bool = True,
    report_tier: bool = False,
    light: bool = False,
    prep_cache: dict | None = None,
    prep: dict | None = None,
):
    """Window-major sweep exact kNN; same results contract as ops.topk.exact_knn.

    ``prep_cache``: optional per-SNAPSHOT dict (DeviceState.prep_cache).  The
    query-independent prep — bias/scale rows in sweep order, per-window error
    bounds, maxd — costs ~1.2 ms/call at DEEP shape when traced inline
    (benchmarks/probe_qprep.py); with a cache it is computed once per published
    snapshot per (metric, plan) — r1-independent since the in-kernel bound
    fold — and fed to the fused program as inputs.
    The cache never populates under an outer trace (values would be tracers);
    traced callers who still want the cached-prep program — e.g. a timing
    harness measuring what eager serving dispatches — pass ``prep`` (a dict
    from :func:`search_prep`) explicitly, threading its arrays as arguments.
    Only used on the unmasked (live_prefix) path: the masked variant's ``valid``
    is a per-query filter bitmap.

    ``report_tier``: additionally return a scalar int32 — which certificate tier
    served the batch: 0 = certified fast selection (margin mode always reports 0),
    1 = widened selection, 2 = full exact scan, -1 = fused path disengaged (the
    row-major scan served the query; no certificate ran).  Serving layers use it
    to expose escalation rates in /statistics and to adapt per-namespace dispatch.

    ``data_t`` MUST be in the window-major sweep layout (``to_sweep_layout``); the
    store maintains it incrementally via ``sweep_cols_for_rows`` scatters.  Falls back
    to the row-major scan for shapes the fused path does not cover.

    ``sweep_err``: [cap] f32 per-row data-side error norms for MIXED configs (f32
    rescan + bf16 sweep mirror) — feeds the exactness certificate's per-window
    bounds (see _fused_t).  Without the residual operands it is
    ``||row - bf16(row)||``; with them it is the residual quantizer's remaining
    error ``||delta - scale*z||``.

    ``resid``/``rscale``/``err1``: residual-corrected sweep (quantize_resid):
    [Dp, cap] int8 sweep-layout codes of delta = row - bf16(row), [cap] f32 per-row
    dequant scales, and [cap] f32 raw ``||delta||`` norms.  Phase 1 adds one VMEM
    matmul to recover qh . delta, shrinking the certified error band ~2^-8x so
    tier-1 certifies even on tightly clustered corpora.

    ``rscale2``: for int8 PRIMARY sweeps (``data_t`` int8, quantize_int8_resid):
    ``rscale`` is the primary dequant scale s1 and ``rscale2`` the residual scale
    s2; ``resid`` then holds codes of delta1 = row - s1*z1 and ``sweep_err``/
    ``err1`` the two-level quantizer's error norms.  Two int8 streams at
    2 B/element total give a certified band comparable to bf16+resid's 3 B/element.
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
        or (data_t.dtype == jnp.int8 and rscale is None)  # codes need dequant scales
    ):
        d, i = exact_knn(q, rescan_data, valid, sq_norms, k=k, metric=metric, db_tile=db_tile)
        return (d, i, jnp.int32(-1)) if report_tier else (d, i)

    masked = live_prefix is None
    hw = jnp.int32(cap if masked else live_prefix)

    bf_sweep = data_t.dtype == jnp.bfloat16
    int8_sweep = data_t.dtype == jnp.int8
    lossy_sweep = bf_sweep or int8_sweep
    mixed = (bf_sweep and rescan_data.dtype != data_t.dtype) or int8_sweep
    # margin/light modes skip the residual stream: the extra matmul/bandwidth would
    # buy rank accuracy margin never proves and light deliberately forgoes
    use_resid = (
        certify and not light
        and resid is not None and rscale is not None and err1 is not None
        and (bf_sweep or (int8_sweep and rscale2 is not None))
    )
    wb_sources, q_tags, err_tags = _cert_plan(
        certify=certify, light=light, mixed=mixed, lossy_sweep=lossy_sweep,
        int8_sweep=int8_sweep, use_resid=use_resid,
        has_sweep_err=sweep_err is not None, has_err1=err1 is not None,
        metric=metric,
    )

    if (
        prep is None
        and prep_cache is not None
        # NEVER populate the cache from inside an outer trace (vmap/jit/fori_loop
        # around this entry): the computed rows would be tracers, and caching a
        # tracer leaks it out of its trace (UnexpectedTracerError on reuse).
        # Inside a trace the fused program simply traces prep inline — same
        # program it compiles for direct callers without a snapshot cache.
        and not isinstance(valid, jax.core.Tracer)
    ):
        # masked entries are valid ONLY while the caller's ``valid`` array is the
        # one the cache is scoped to: the snapshot dict is scoped to the
        # snapshot's own liveness mask, and the engine passes a per-(filter,
        # version) dict for filtered searches (FilterMaskCache.prep_cache_for)
        # NOTE: r1 is deliberately NOT in the key — prep is r1-independent since
        # the in-kernel bound fold (eb_rows are per-ROW, not per-window), so all
        # k-buckets of one (metric, config) share one prep dict entry.
        key = (metric, -1 if live_prefix is None else int(live_prefix),
               masked, certify, light, use_resid, wb_sources, str(data_t.dtype))
        prep = prep_cache.get(key)
        if prep is None:
            prep = _prep_terms_jit(
                valid, sq_norms, hw, rscale, rscale2, sweep_err, err1,
                cap=cap, metric=metric, masked=masked,
                int8_sweep=int8_sweep, bf_sweep=bf_sweep, use_resid=use_resid,
                wb_sources=wb_sources,
            )
            prep_cache[key] = prep  # GIL-atomic set; a racing reader just recomputes

    d, i, tier = _fused_t(
        q, data_t, rescan_data, valid, sq_norms, hw, sweep_err, resid, rscale, err1,
        rscale2, prep, k=k, metric=metric, r1=r1, masked=masked, q_tile=qt_w,
        certify=certify, light=light, use_resid=use_resid, wb_sources=wb_sources,
        q_tags=q_tags, err_tags=err_tags,
        # globals read at CALL time and passed as a STATIC arg: distinct tuning
        # settings get distinct compiled programs (see _fused_t's tuning note)
        tuning=(TOPM_ENABLE, RESCAN_CHUNK_FROM, BLOCKTOP_ENABLE, TOPM_BM,
                CONTAIN_ENABLE),
    )
    return (d, i, tier) if report_tier else (d, i)
