"""Transposed-sweep kernel (ops/pallas_knn_t.py): oracle equality in interpret mode.

Same exactness contract as the row-major kernel; additionally covers the two-buffer
mode (bf16 sweep + f32 rescan) and the boundary-tile-only tail mask.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mlvectordb_tpu.ops.pallas_knn_t import (
    DB_TILE,
    exact_knn_pallas_t,
    sweep_cols_for_rows,
    sweep_rows_1d,
    to_sweep_layout,
)
from mlvectordb_tpu.ops.topk import exact_knn

N = 2 * DB_TILE
D = 128


def _mk(rng, n=N, d=D):
    db = rng.standard_normal((n, d), dtype=np.float32)
    sq = (db.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    return jnp.asarray(db), jnp.asarray(sq)


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
@pytest.mark.parametrize("masked", [False, True])
def test_matches_scan_backend(rng, metric, masked):
    db, sq = _mk(rng)
    q = jnp.asarray(rng.standard_normal((8, D), dtype=np.float32))
    valid = jnp.ones((N,), jnp.bool_)
    dp, ipx = exact_knn_pallas_t(
        q, to_sweep_layout(db), db, valid, sq, k=5, metric=metric,
        live_prefix=None if masked else N,
    )
    da, ia = exact_knn(q, db, valid, sq, k=5, metric=metric, db_tile=DB_TILE)
    for b in range(8):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist())
    np.testing.assert_allclose(
        np.sort(np.asarray(dp), 1), np.sort(np.asarray(da), 1), rtol=1e-4, atol=1e-4
    )


def test_bf16_sweep_f32_rescan_matches_oracle(rng):
    """Two-buffer mode: phase 1 ranks on the bf16 mirror, rescan scores the f32 rows —
    results must match the f32 oracle set-exactly and scores must be f32-accurate."""
    db, sq = _mk(rng)
    q = jnp.asarray(rng.standard_normal((8, D), dtype=np.float32))
    valid = jnp.ones((N,), jnp.bool_)
    db16t = to_sweep_layout(db, dtype=jnp.bfloat16)
    dp, ipx = exact_knn_pallas_t(q, db16t, db, valid, sq, k=10, metric="l2", live_prefix=N)
    da, ia = exact_knn(q, db, valid, sq, k=10, metric="l2", db_tile=DB_TILE)
    for b in range(8):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist())
    np.testing.assert_allclose(
        np.sort(np.asarray(dp), 1), np.sort(np.asarray(da), 1), rtol=1e-5, atol=1e-5
    )


def test_tail_mask_excludes_unwritten_rows(rng):
    db_np = rng.standard_normal((N, D)).astype(np.float32) + 3.0
    hw = N - DB_TILE // 2  # high water mid-tile: the straddling tile must mask
    db_np[hw:] = 0.0  # unwritten rows are zeros => l2 dist 0 for a zero query
    db = jnp.asarray(db_np)
    sq = jnp.asarray((db_np ** 2).sum(-1))
    q = jnp.zeros((8, D), jnp.float32)
    valid = jnp.ones((N,), jnp.bool_)
    dp, ipx = exact_knn_pallas_t(q, to_sweep_layout(db), db, valid, sq, k=5, metric="l2", live_prefix=hw)
    assert (np.asarray(ipx) < hw).all(), "phantom unwritten row admitted"


def test_masked_variant_excludes_tombstones(rng):
    db, sq = _mk(rng)
    q = jnp.asarray(np.asarray(db[5:13]) + 0.001)
    valid = np.ones(N, bool)
    valid[5] = False
    dp, ipx = exact_knn_pallas_t(
        q, to_sweep_layout(db), db, jnp.asarray(valid), sq, k=3, metric="l2", live_prefix=None
    )
    assert 5 not in np.asarray(ipx)[0].tolist()
    assert np.asarray(ipx)[1, 0] == 6


def test_small_capacity_falls_back_to_scan(rng):
    db, sq = _mk(rng, n=512)
    q = jnp.asarray(rng.standard_normal((4, D), dtype=np.float32))
    valid = jnp.ones((512,), jnp.bool_)
    dp, ipx = exact_knn_pallas_t(q, db.T, db, valid, sq, k=3, metric="l2", live_prefix=512)
    da, ia = exact_knn(q, db, valid, sq, k=3, metric="l2", db_tile=512)
    np.testing.assert_array_equal(np.asarray(ipx), np.asarray(ia))


def test_k_clamps_and_pads(rng):
    db, sq = _mk(rng)
    q = jnp.asarray(rng.standard_normal((8, D), dtype=np.float32))
    valid = jnp.ones((N,), jnp.bool_)
    # big k on the fused path (k*r1 <= cap holds for r1=32 only when k small; force r1)
    dp, ipx = exact_knn_pallas_t(
        q, to_sweep_layout(db), db, valid, sq, k=128, metric="l2", live_prefix=N, r1_override=8
    )
    da, ia = exact_knn(q, db, valid, sq, k=128, metric="l2", db_tile=DB_TILE)
    for b in range(8):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist())


def test_k1000_oracle_equality(rng):
    """k=1000 is the REST contract's cap (reference rest_api.py:24) — the fused path
    must cover it with set-exact results (VERDICT r1 next-step #7)."""
    db, sq = _mk(rng, n=4 * DB_TILE)
    n = 4 * DB_TILE
    q = jnp.asarray(rng.standard_normal((4, D), dtype=np.float32))
    valid = jnp.ones((n,), jnp.bool_)
    dp, ipx = exact_knn_pallas_t(q, to_sweep_layout(db), db, valid, sq, k=1000, metric="l2",
                                 live_prefix=n, r1_override=4)
    da, ia = exact_knn(q, db, valid, sq, k=1000, metric="l2", db_tile=DB_TILE)
    for b in range(4):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist())
    np.testing.assert_allclose(
        np.sort(np.asarray(dp), 1), np.sort(np.asarray(da), 1), rtol=1e-4, atol=1e-4
    )


def test_sweep_layout_roundtrip(rng):
    """Layout identities: to_sweep_layout, sweep_cols_for_rows, sweep_rows_1d agree."""
    db, sq = _mk(rng)
    sw = np.asarray(to_sweep_layout(db))
    rows = np.arange(N)
    cols = sweep_cols_for_rows(rows)
    # column cols[s] of the sweep mirror holds store row s
    np.testing.assert_array_equal(sw[:, cols], np.asarray(db).T)
    # per-row vector permutation matches the column mapping
    v = rng.standard_normal(N).astype(np.float32)
    vp = np.asarray(sweep_rows_1d(jnp.asarray(v)))
    np.testing.assert_array_equal(vp[cols], v)


@pytest.mark.parametrize("r1", [1, 2, 4, 8, 16, 32])
def test_every_window_width_matches_oracle(rng, r1):
    """The grouped-emission kernel must be exact at every supported granularity."""
    db, sq = _mk(rng)
    q = jnp.asarray(rng.standard_normal((8, D), dtype=np.float32))
    valid = jnp.ones((N,), jnp.bool_)
    k = 7
    dp, ipx = exact_knn_pallas_t(
        q, to_sweep_layout(db), db, valid, sq, k=k, metric="l2",
        live_prefix=N, r1_override=r1,
    )
    da, ia = exact_knn(q, db, valid, sq, k=k, metric="l2", db_tile=DB_TILE)
    for b in range(8):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist()), (r1, b)


def test_chunked_topk_path_is_exact(rng):
    """k > 256 routes wide selections through the chunked top_k — results must be
    identical to the scan backend (set-exact)."""
    n = 4 * DB_TILE
    db, sq = _mk(rng, n=n)
    q = jnp.asarray(rng.standard_normal((4, D), dtype=np.float32))
    valid = jnp.ones((n,), jnp.bool_)
    dp, ipx = exact_knn_pallas_t(q, to_sweep_layout(db), db, valid, sq, k=300,
                                 metric="l2", live_prefix=n, r1_override=4)
    da, ia = exact_knn(q, db, valid, sq, k=300, metric="l2", db_tile=DB_TILE)
    for b in range(4):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist())


def test_bf16_sweep_exact_on_tightly_clustered_data(rng):
    """Adversarial for the phase-1 selection margin (ADVICE r2): tightly clustered
    points make bf16 window ranks nearly tied everywhere, so a too-small margin would
    drop true neighbours.  Ties make index sets ambiguous, so the gate is on
    distances: every returned row's true f32 distance must be <= the oracle's k-th
    distance (+f32 eps), and the sorted score vectors must match."""
    K = 10
    centers = (rng.standard_normal((8, D)).astype(np.float32) * 0.05)
    assign = rng.integers(0, 8, N)
    db_np = (centers[assign] + rng.standard_normal((N, D)).astype(np.float32) * 1e-3)
    db = jnp.asarray(db_np)
    sq = jnp.sum(db * db, axis=-1)
    q_np = (centers[rng.integers(0, 8, 8)]
            + rng.standard_normal((8, D)).astype(np.float32) * 1e-3)
    q = jnp.asarray(q_np)
    valid = jnp.ones((N,), jnp.bool_)

    dp, ipx = exact_knn_pallas_t(
        q, to_sweep_layout(db, dtype=jnp.bfloat16), db, valid, sq,
        k=K, metric="l2", live_prefix=N,
    )
    dp, ipx = np.asarray(dp), np.asarray(ipx)

    d_or = ((q_np[:, None, :] - db_np[None, :, :]) ** 2).sum(-1)
    kth = np.sort(d_or, axis=1)[:, K - 1]
    for b in range(8):
        true_d = d_or[b, ipx[b]]
        assert (true_d <= kth[b] + 1e-5).all(), (b, true_d, kth[b])
        np.testing.assert_allclose(
            np.sort(dp[b]), np.sort(d_or[b])[:K], rtol=1e-4, atol=1e-5
        )


def test_per_window_certificate_with_sweep_err_clustered(rng):
    """The per-window optimistic-bound path (sweep_err given, mixed bf16 sweep): the
    certificate must stay exact on tightly clustered data, with selection pulling
    uncertain windows into the rescan (VERDICT r3 #1)."""
    from mlvectordb_tpu.ops.pallas_knn_t import sweep_err_norms

    K = 10
    centers = (rng.standard_normal((8, D)).astype(np.float32) * 0.05)
    assign = rng.integers(0, 8, N)
    db_np = (centers[assign] + rng.standard_normal((N, D)).astype(np.float32) * 1e-3)
    db = jnp.asarray(db_np)
    sq = jnp.sum(db * db, axis=-1)
    q_np = (centers[rng.integers(0, 8, 8)]
            + rng.standard_normal((8, D)).astype(np.float32) * 1e-3)
    q = jnp.asarray(q_np)
    valid = jnp.ones((N,), jnp.bool_)

    dp, ipx = exact_knn_pallas_t(
        q, to_sweep_layout(db, dtype=jnp.bfloat16), db, valid, sq,
        k=K, metric="l2", live_prefix=N, sweep_err=sweep_err_norms(db),
    )
    dp, ipx = np.asarray(dp), np.asarray(ipx)
    d_or = ((q_np[:, None, :] - db_np[None, :, :]) ** 2).sum(-1)
    kth = np.sort(d_or, axis=1)[:, K - 1]
    for b in range(8):
        true_d = d_or[b, ipx[b]]
        assert (true_d <= kth[b] + 1e-5).all(), (b, true_d, kth[b])
        np.testing.assert_allclose(
            np.sort(dp[b]), np.sort(d_or[b])[:K], rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_per_window_certificate_localizes_error(rng, metric):
    """A few huge-magnitude rows (large bf16 rounding error) must not break exactness
    for queries whose neighbourhoods are elsewhere — the per-window bounds localize
    the error instead of inflating a global band."""
    from mlvectordb_tpu.ops.pallas_knn_t import sweep_err_norms

    db_np = rng.standard_normal((N, D)).astype(np.float32)
    hot = rng.choice(N, 64, replace=False)
    db_np[hot] *= 1000.0  # these rows carry ~2000x the bf16 absolute error
    db = jnp.asarray(db_np)
    sq = jnp.sum(db * db, axis=-1)
    q = jnp.asarray(rng.standard_normal((8, D)).astype(np.float32))
    valid = jnp.ones((N,), jnp.bool_)

    dp, ipx = exact_knn_pallas_t(
        q, to_sweep_layout(db, dtype=jnp.bfloat16), db, valid, sq,
        k=7, metric=metric, live_prefix=N, sweep_err=sweep_err_norms(db),
    )
    da, ia = exact_knn(q, db, valid, sq, k=7, metric=metric, db_tile=DB_TILE)
    for b in range(8):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist()), (metric, b)


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_residual_corrected_sweep_matches_oracle_on_clustered(rng, metric):
    """Residual-corrected bf16 sweep (int8 delta codes): tier-1 must certify and the
    results must match the f32 oracle on data whose neighbour gaps sit far below the
    raw bf16 error band (the VERDICT r3 clustered-collapse case)."""
    from mlvectordb_tpu.ops.pallas_knn_t import quantize_resid

    K = 10
    centers = rng.standard_normal((16, D)).astype(np.float32) * 4.0
    assign = rng.integers(0, 16, N)
    db_np = centers[assign] + rng.standard_normal((N, D)).astype(np.float32) * 0.02
    db = jnp.asarray(db_np)
    sq = jnp.sum(db * db, axis=-1)
    q_np = (centers[rng.integers(0, 16, 8)]
            + rng.standard_normal((8, D)).astype(np.float32) * 0.02)
    q = jnp.asarray(q_np)
    valid = jnp.ones((N,), jnp.bool_)
    resid, rscale, e2, e1 = quantize_resid(db)

    dp, ipx = exact_knn_pallas_t(
        q, to_sweep_layout(db, dtype=jnp.bfloat16), db, valid, sq,
        k=K, metric=metric, live_prefix=N,
        sweep_err=e2, resid=resid, rscale=rscale, err1=e1,
    )
    dp, ipx = np.asarray(dp), np.asarray(ipx)
    da, ia = exact_knn(q, db, valid, sq, k=K, metric=metric, db_tile=DB_TILE)
    da, ia = np.asarray(da), np.asarray(ia)
    for b in range(8):
        # ties make index sets ambiguous on clustered data: gate on distances
        np.testing.assert_allclose(np.sort(dp[b]), np.sort(da[b]), rtol=1e-4, atol=1e-5)


def test_residual_quantization_identities(rng):
    """quantize_resid invariants: reconstruction error matches err2, layout matches
    sweep_cols_for_rows, and err2 is dramatically smaller than the raw bf16 band."""
    from mlvectordb_tpu.ops.pallas_knn_t import quantize_resid, quantize_resid_rows

    db = rng.standard_normal((N, D)).astype(np.float32) * 3.0
    z, scale, e2, e1 = map(np.asarray, quantize_resid_rows(jnp.asarray(db)))
    delta = db - np.asarray(jnp.asarray(db).astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_allclose(np.linalg.norm(delta, axis=1), e1, rtol=1e-5, atol=1e-9)
    rec = scale[:, None] * z
    np.testing.assert_allclose(np.linalg.norm(delta - rec, axis=1), e2, rtol=1e-4, atol=1e-9)
    live = e1 > 0
    assert np.all(e2[live] <= e1[live] * 0.02 + 1e-12), "int8 codes should kill ~99% of the band"

    resid_t, scale2, _, _ = map(np.asarray, quantize_resid(jnp.asarray(db)))
    cols = sweep_cols_for_rows(np.arange(N))
    np.testing.assert_array_equal(resid_t[:, cols], z.T)
    np.testing.assert_array_equal(scale2, scale)


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_int8_primary_sweep_certified_matches_oracle(rng, metric):
    """sweep_dtype="int8": phase 1 ranks on per-row-scaled int8 codes at 1
    byte/element; the certificate (per-window quantization-error bounds) keeps the
    results set-exact vs the scan backend, escalating when int8 resolution is not
    enough (VERDICT r3 #4)."""
    from mlvectordb_tpu.ops.pallas_knn_t import quantize_int8

    db, sq = _mk(rng)
    q = jnp.asarray(rng.standard_normal((8, D), dtype=np.float32))
    valid = jnp.ones((N,), jnp.bool_)
    codes, rscale, qerr = quantize_int8(db)
    assert codes.dtype == jnp.int8

    dp, ipx = exact_knn_pallas_t(
        q, codes, db, valid, sq, k=7, metric=metric, live_prefix=N,
        sweep_err=qerr, rscale=rscale,
    )
    da, ia = exact_knn(q, db, valid, sq, k=7, metric=metric, db_tile=DB_TILE)
    for b in range(8):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist()), (metric, b)
    np.testing.assert_allclose(
        np.sort(np.asarray(dp), 1), np.sort(np.asarray(da), 1), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_int8_resid_sweep_certified_matches_oracle_on_clustered(rng, metric):
    """Two-level int8 sweep (primary codes + residual codes, 2 B/element total):
    tier-1 must certify and match the f32 oracle on tightly clustered data — the
    same contract as the bf16+resid config at 2/3 the phase-1 bytes."""
    from mlvectordb_tpu.ops.pallas_knn_t import quantize_int8_resid

    K = 10
    centers = rng.standard_normal((16, D)).astype(np.float32) * 4.0
    assign = rng.integers(0, 16, N)
    db_np = centers[assign] + rng.standard_normal((N, D)).astype(np.float32) * 0.02
    db = jnp.asarray(db_np)
    sq = jnp.sum(db * db, axis=-1)
    q_np = (centers[rng.integers(0, 16, 8)]
            + rng.standard_normal((8, D)).astype(np.float32) * 0.02)
    q = jnp.asarray(q_np)
    valid = jnp.ones((N,), jnp.bool_)
    codes, s1, resid, s2, e2, e1 = quantize_int8_resid(db)
    assert codes.dtype == jnp.int8 and resid.dtype == jnp.int8

    dp, ipx = exact_knn_pallas_t(
        q, codes, db, valid, sq, k=K, metric=metric, live_prefix=N,
        sweep_err=e2, resid=resid, rscale=s1, err1=e1, rscale2=s2,
    )
    dp = np.asarray(dp)
    da, ia = exact_knn(q, db, valid, sq, k=K, metric=metric, db_tile=DB_TILE)
    da = np.asarray(da)
    for b in range(8):
        # ties make index sets ambiguous on clustered data: gate on distances
        np.testing.assert_allclose(np.sort(dp[b]), np.sort(da[b]), rtol=1e-4, atol=1e-5)


def test_int8_resid_quantization_identities(rng):
    """quantize_int8_resid invariants: two-level reconstruction error matches err2,
    err1 matches the primary quantizer's error, layouts match sweep_cols_for_rows,
    and the residual codes kill ~99% of the primary band."""
    from mlvectordb_tpu.ops.pallas_knn_t import (
        quantize_int8_resid,
        quantize_int8_resid_rows,
    )

    db = rng.standard_normal((N, D)).astype(np.float32) * 3.0
    z1, s1, z2, s2, e2, e1 = map(np.asarray, quantize_int8_resid_rows(jnp.asarray(db)))
    delta1 = db - s1[:, None] * z1
    np.testing.assert_allclose(np.linalg.norm(delta1, axis=1), e1, rtol=1e-4, atol=1e-9)
    rec = s1[:, None] * z1 + s2[:, None] * z2
    # e2 norms are ~1e-4 of the row scale: recomputing them in a different f32
    # summation order wobbles the last couple of bits, hence the loose rtol
    np.testing.assert_allclose(np.linalg.norm(db - rec, axis=1), e2, rtol=2e-3, atol=1e-8)
    live = e1 > 0
    assert np.all(e2[live] <= e1[live] * 0.02 + 1e-12), "resid codes should kill ~99% of the band"
    assert np.abs(z1).max() <= 127 and np.abs(z2).max() <= 127

    c1, s1b, c2, s2b, _, _ = map(np.asarray, quantize_int8_resid(jnp.asarray(db)))
    cols = sweep_cols_for_rows(np.arange(N))
    np.testing.assert_array_equal(c1[:, cols], z1.T)
    np.testing.assert_array_equal(c2[:, cols], z2.T)
    np.testing.assert_array_equal(s1b, s1)
    np.testing.assert_array_equal(s2b, s2)


def test_report_tier_reflects_certificate_escalation(rng):
    """report_tier: 0 when the certified fast tier serves (benign gaussian data with
    per-window sweep_err bounds), 2 when the proof fails batch-wide and the exact
    scan serves (tightly clustered data, no residual correction), -1 when the fused
    path disengages (capacity below two sweep tiles)."""
    from mlvectordb_tpu.ops.pallas_knn_t import sweep_err_norms

    K = 10
    # benign gaussian: tier 0
    db, sq = _mk(rng)
    q = jnp.asarray(rng.standard_normal((8, D), dtype=np.float32))
    valid = jnp.ones((N,), jnp.bool_)
    _, _, tier = exact_knn_pallas_t(
        q, to_sweep_layout(db, dtype=jnp.bfloat16), db, valid, sq,
        k=K, metric="l2", live_prefix=N, sweep_err=sweep_err_norms(db),
        report_tier=True,
    )
    assert int(tier) == 0

    # adversarial clustered without residual correction: the certificate must fail
    # and the exact scan must serve
    centers = (rng.standard_normal((8, D)).astype(np.float32) * 0.05)
    assign = rng.integers(0, 8, N)
    db_np = (centers[assign] + rng.standard_normal((N, D)).astype(np.float32) * 1e-3)
    dbc = jnp.asarray(db_np)
    sqc = jnp.sum(dbc * dbc, axis=-1)
    qc = jnp.asarray(centers[rng.integers(0, 8, 8)]
                     + rng.standard_normal((8, D)).astype(np.float32) * 1e-3)
    _, _, tier = exact_knn_pallas_t(
        qc, to_sweep_layout(dbc, dtype=jnp.bfloat16), dbc, valid, sqc,
        k=K, metric="l2", live_prefix=N, sweep_err=sweep_err_norms(dbc),
        report_tier=True,
    )
    assert int(tier) in (1, 2) and int(tier) == 2  # batch-wide failure -> exact scan

    # disengaged: capacity below two sweep tiles falls back to the row-major scan
    small = jnp.asarray(rng.standard_normal((512, D), dtype=np.float32))
    _, _, tier = exact_knn_pallas_t(
        q[:4], small.T, small, jnp.ones((512,), jnp.bool_),
        jnp.sum(small * small, -1),
        k=K, metric="l2", live_prefix=512, report_tier=True,
    )
    assert int(tier) == -1


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_light_certified_tier_exact(rng, metric):
    """LIGHT certified tier (single pass, no query compensation, no resid): results
    must match the oracle set-exactly on benign data with tier 0, and remain exact
    via escalation (tier 2) on adversarial clustered data."""
    from mlvectordb_tpu.ops.pallas_knn_t import quantize_resid

    db, sq = _mk(rng)
    q = jnp.asarray(rng.standard_normal((8, D), dtype=np.float32))
    valid = jnp.ones((N,), jnp.bool_)
    resid, rscale, e2, e1 = quantize_resid(db)
    dp, ipx, tier = exact_knn_pallas_t(
        q, to_sweep_layout(db, dtype=jnp.bfloat16), db, valid, sq,
        k=7, metric=metric, live_prefix=N,
        sweep_err=e2, resid=resid, rscale=rscale, err1=e1,
        light=True, report_tier=True,
    )
    da, ia = exact_knn(q, db, valid, sq, k=7, metric=metric, db_tile=DB_TILE)
    for b in range(8):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist()), (metric, b)
    assert int(tier) == 0, f"light tier should certify benign gaussian data ({metric})"

    # adversarial clustered: light must escalate to the exact scan and stay correct
    centers = (rng.standard_normal((8, D)).astype(np.float32) * 0.05)
    assign = rng.integers(0, 8, N)
    db_np = (centers[assign] + rng.standard_normal((N, D)).astype(np.float32) * 1e-3)
    dbc = jnp.asarray(db_np)
    sqc = jnp.sum(dbc * dbc, axis=-1)
    qc = jnp.asarray(centers[rng.integers(0, 8, 8)]
                     + rng.standard_normal((8, D)).astype(np.float32) * 1e-3)
    residc, rscalec, e2c, e1c = quantize_resid(dbc)
    dp, ipx, tier = exact_knn_pallas_t(
        qc, to_sweep_layout(dbc, dtype=jnp.bfloat16), dbc, valid, sqc,
        k=7, metric="l2", live_prefix=N,
        sweep_err=e2c, resid=residc, rscale=rscalec, err1=e1c,
        light=True, report_tier=True,
    )
    da, ia = exact_knn(qc, dbc, valid, sqc, k=7, metric="l2", db_tile=DB_TILE)
    np.testing.assert_allclose(
        np.sort(np.asarray(dp), 1), np.sort(np.asarray(da), 1), rtol=1e-4, atol=1e-5
    )
    assert int(tier) == 2, "light tier should escalate on clustered data"


def test_int8_quantization_identities(rng):
    from mlvectordb_tpu.ops.pallas_knn_t import quantize_int8, quantize_int8_rows

    db = rng.standard_normal((N, D)).astype(np.float32) * 2.0
    z, scale, err = map(np.asarray, quantize_int8_rows(jnp.asarray(db)))
    rec = scale[:, None] * z
    np.testing.assert_allclose(np.linalg.norm(db - rec, axis=1), err, rtol=1e-4, atol=1e-9)
    assert np.abs(z).max() <= 127
    codes_t, scale2, _ = map(np.asarray, quantize_int8(jnp.asarray(db)))
    cols = sweep_cols_for_rows(np.arange(N))
    np.testing.assert_array_equal(codes_t[:, cols], z.T)


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_same_dtype_bf16_sweep_single_pass_certified(rng, metric):
    """DEEP config (bf16 store + bf16 sweep): the single-pass query with the
    per-window norm bound must stay set-exact vs the scan backend over the SAME
    bf16 rows (query rounding is the only phase-1/rescan mismatch)."""
    db32, _ = _mk(rng)
    db16 = db32.astype(jnp.bfloat16)
    sq = jnp.sum(db16.astype(jnp.float32) ** 2, axis=-1)
    q = jnp.asarray(rng.standard_normal((8, D), dtype=np.float32))
    valid = jnp.ones((N,), jnp.bool_)
    dp, ipx = exact_knn_pallas_t(
        q, to_sweep_layout(db16), db16, valid, sq, k=7, metric=metric, live_prefix=N,
    )
    da, ia = exact_knn(q, db16, valid, sq, k=7, metric=metric, db_tile=DB_TILE)
    for b in range(8):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist()), (metric, b)


def test_prep_cache_not_poisoned_by_outer_trace(rng):
    """Calling the entry under an outer jit must neither raise UnexpectedTracerError
    on a later eager call nor cache traced arrays (the snapshot prep cache only
    populates eagerly; inside a trace the prep terms trace inline)."""
    import jax

    from mlvectordb_tpu.ops.pallas_knn_t import quantize_resid, sweep_err_norms

    db, sq = _mk(rng)
    dbt = to_sweep_layout(db, dtype=jnp.bfloat16)
    serr = sweep_err_norms(db)
    valid = jnp.ones((N,), bool)
    q = jnp.asarray(rng.standard_normal((8, D), dtype=np.float32))
    cache: dict = {}

    @jax.jit
    def traced(qq, ddt, dd, vv, ss, se):
        return exact_knn_pallas_t(qq, ddt, dd, vv, ss, k=5, metric="l2",
                                  live_prefix=N, sweep_err=se, prep_cache=cache)

    d1, i1 = traced(q, dbt, db, valid, sq, serr)
    assert not cache, "prep cache populated with traced arrays"
    # eager call afterwards: populates the cache with concrete arrays and agrees
    d2, i2 = exact_knn_pallas_t(q, dbt, db, valid, sq, k=5, metric="l2",
                                live_prefix=N, sweep_err=serr, prep_cache=cache)
    assert cache, "eager call should populate the prep cache"
    assert all(not isinstance(v, jax.core.Tracer)
               for p in cache.values() for v in jax.tree_util.tree_leaves(p))
    np.testing.assert_array_equal(np.sort(np.asarray(i1)), np.sort(np.asarray(i2)))
    # reuse the now-populated cache eagerly again (exercises the cached branch)
    d3, i3 = exact_knn_pallas_t(q, dbt, db, valid, sq, k=5, metric="l2",
                                live_prefix=N, sweep_err=serr, prep_cache=cache)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i3))


def test_search_prep_matches_inline_and_cache(rng):
    """search_prep's explicit dict must produce the same results as the inline-prep
    and cache-prep programs, for certified, light and margin configurations."""
    import jax.tree_util as jtu

    from mlvectordb_tpu.ops.pallas_knn_t import quantize_resid, search_prep

    db, sq = _mk(rng)
    dbt = to_sweep_layout(db, dtype=jnp.bfloat16)
    resid, rscale, err2, err1 = quantize_resid(db)
    valid = jnp.ones((N,), bool)
    q = jnp.asarray(rng.standard_normal((8, D), dtype=np.float32))

    for certify, light in ((True, False), (True, True), (False, False)):
        kw = dict(k=7, metric="l2", live_prefix=N, certify=certify, light=light,
                  sweep_err=err2, resid=resid, rscale=rscale, err1=err1)
        d0, i0 = exact_knn_pallas_t(q, dbt, db, valid, sq, **kw)
        prep = search_prep(8, dbt, db.dtype, valid, sq, **kw)
        # thread the prep arrays as args through a jit, like the timing harness
        leaves, tdef = jtu.tree_flatten(prep)

        import jax

        @jax.jit
        def run(qq, ddt, dd, vv, ss, se, rz, rs, e1, *pl, _kw=tuple(sorted(
                (k2, v) for k2, v in kw.items() if not hasattr(v, "shape"))),
                _tdef=tdef, _certify=certify, _light=light):
            return exact_knn_pallas_t(
                qq, ddt, dd, vv, ss, k=7, metric="l2", live_prefix=N,
                certify=_certify, light=_light, sweep_err=se, resid=rz,
                rscale=rs, err1=e1, prep=jtu.tree_unflatten(_tdef, pl))

        d1, i1 = run(q, dbt, db, valid, sq, err2, resid, rscale, err1, *leaves)
        np.testing.assert_array_equal(np.sort(np.asarray(i0)), np.sort(np.asarray(i1)))
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=0, atol=0)


def test_topm_pool_tier_matches_oracle(rng):
    """Per-tile top-m candidate epilogue (engages when nt*m covers the tier-1
    width): certified search on benign data serves from tier 0 via the kernel's
    candidate pool and matches the f32 oracle set-exactly — masked and unmasked."""
    from mlvectordb_tpu.ops.pallas_knn_t import sweep_err_norms

    # k=32 -> m=8 pool rows/tile, width s1=52; nt=32 satisfies the 4x slack gate
    # (pool 256 >= 4*52) and k>16 skips the block-min-eligible configs the pool
    # cedes to the wmin selection
    n, k = 32 * DB_TILE, 32
    db, sq = _mk(rng, n=n)
    q = jnp.asarray(rng.standard_normal((8, D), dtype=np.float32))
    dbt = to_sweep_layout(db, dtype=jnp.bfloat16)
    se = sweep_err_norms(db)

    valid = jnp.ones((n,), jnp.bool_)
    dp, ipx, tier = exact_knn_pallas_t(
        q, dbt, db, valid, sq, k=k, metric="l2", live_prefix=n,
        sweep_err=se, report_tier=True,
    )
    assert int(tier) == 0  # the pool tier itself served (no escalation)
    da, ia = exact_knn(q, db, valid, sq, k=k, metric="l2", db_tile=DB_TILE)
    for b in range(8):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist())
    np.testing.assert_allclose(
        np.sort(np.asarray(dp), 1), np.sort(np.asarray(da), 1), rtol=1e-5, atol=1e-5
    )

    # masked variant: tombstone the best hit of query 0
    vm = np.ones(n, bool)
    vm[int(np.asarray(ia)[0, 0])] = False
    dpm, ipm = exact_knn_pallas_t(
        q, dbt, db, jnp.asarray(vm), sq, k=k, metric="l2", live_prefix=None,
        sweep_err=se,
    )
    dam, iam = exact_knn(q, db, jnp.asarray(vm), sq, k=k, metric="l2", db_tile=DB_TILE)
    for b in range(8):
        assert set(np.asarray(ipm)[b].tolist()) == set(np.asarray(iam)[b].tolist())


def test_topm_pool_overflow_escalates_not_corrupts(rng):
    """More strong candidate WINDOWS packed into one sweep tile than the pool's m:
    the per-tile pool hides some of them, the selection floor (min over tiles of
    each tile's m-th min) drops below the k-th found distance, and the certificate
    must escalate — never return a corrupted set."""
    from mlvectordb_tpu.ops.pallas_knn_t import sweep_err_norms

    # k=32 -> m=8 pool rows/tile, width 52; nt=32 passes the 4x slack gate
    n = 32 * DB_TILE
    k, r1 = 32, 16  # r1=16 windows at k=32
    db_np = rng.standard_normal((n, D)).astype(np.float32) * 4.0  # far background
    qv = rng.standard_normal((D,)).astype(np.float32)
    # 20 planted near-neighbours at stride r1 inside tile 0 -> 20 hot windows in
    # ONE tile; the pool surfaces only its 8 best
    for j in range(20):
        db_np[j * r1] = qv + rng.standard_normal(D).astype(np.float32) * 0.01
    db = jnp.asarray(db_np)
    sq = jnp.sum(db * db, axis=-1)
    q = jnp.asarray(np.broadcast_to(qv, (8, D)).copy())
    valid = jnp.ones((n,), jnp.bool_)
    dp, ipx, tier = exact_knn_pallas_t(
        q, to_sweep_layout(db, dtype=jnp.bfloat16), db, valid, sq,
        k=k, metric="l2", live_prefix=n, sweep_err=sweep_err_norms(db),
        report_tier=True,
    )
    assert int(tier) >= 1, "hidden-window overflow must escalate the certificate"
    da, ia = exact_knn(q, db, valid, sq, k=k, metric="l2", db_tile=DB_TILE)
    for b in range(8):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist())


def test_topm_large_k_pool_matches_oracle(rng):
    """m=16 pool at k>128 (the k=1000-class structure, scaled to test size):
    certified tier-0 service from the pool, oracle set-equality."""
    from mlvectordb_tpu.ops.pallas_knn_t import sweep_err_norms

    n = 64 * DB_TILE
    k = 160  # -> m=16, r1=8, nt=64, pool=1024 >= width 196
    db, sq = _mk(rng, n=n)
    q = jnp.asarray(rng.standard_normal((4, D), dtype=np.float32))
    valid = jnp.ones((n,), jnp.bool_)
    dp, ipx, tier = exact_knn_pallas_t(
        q, to_sweep_layout(db, dtype=jnp.bfloat16), db, valid, sq,
        k=k, metric="l2", live_prefix=n, sweep_err=sweep_err_norms(db),
        report_tier=True,
    )
    assert int(tier) == 0
    da, ia = exact_knn(q, db, valid, sq, k=k, metric="l2", db_tile=DB_TILE)
    for b in range(4):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist())
    np.testing.assert_allclose(
        np.sort(np.asarray(dp), 1), np.sort(np.asarray(da), 1), rtol=1e-4, atol=1e-4
    )


def test_mixed_batch_contained_escalation(rng):
    """ONE adversarial query in an otherwise benign batch (VERDICT r4 weak #4):
    the per-query certificate localizes the failure, the contained tier re-proves
    only an 8-query sub-batch at tier-2 width (tier reports 1, not 2 — the exact
    scan never runs), and every query's result matches the oracle set-exactly."""
    from mlvectordb_tpu.ops.pallas_knn_t import sweep_err_norms

    n = 32 * DB_TILE
    k, r1 = 32, 16  # _pick_r1(k=32) = 16; pool path (m=8) serves tier 1
    db_np = rng.standard_normal((n, D)).astype(np.float32) * 4.0
    qv = rng.standard_normal((D,)).astype(np.float32)
    # 20 planted near-neighbours at stride r1 inside tile 0: more hot windows in
    # one tile than the pool's m=8 -> query 0's tier-1 certificate fails
    for j in range(20):
        db_np[j * r1] = qv + rng.standard_normal(D).astype(np.float32) * 0.01
    db = jnp.asarray(db_np)
    sq = jnp.sum(db * db, axis=-1)
    q_np = rng.standard_normal((16, D)).astype(np.float32)
    q_np[0] = qv  # the poisoned slot; the other 15 are benign gaussian
    q = jnp.asarray(q_np)
    valid = jnp.ones((n,), jnp.bool_)
    dp, ipx, tier = exact_knn_pallas_t(
        q, to_sweep_layout(db, dtype=jnp.bfloat16), db, valid, sq,
        k=k, metric="l2", live_prefix=n, sweep_err=sweep_err_norms(db),
        report_tier=True,
    )
    assert int(tier) == 1, (
        f"one poisoned query should be served by the CONTAINED tier (1), got {int(tier)}"
    )
    da, ia = exact_knn(q, db, valid, sq, k=k, metric="l2", db_tile=DB_TILE)
    for b in range(16):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist()), b
    np.testing.assert_allclose(
        np.sort(np.asarray(dp), 1), np.sort(np.asarray(da), 1), rtol=1e-4, atol=1e-4
    )


def test_mixed_batch_many_failures_still_exact(rng):
    """More failing queries than the contained tier's sub-batch (9 > 8): the
    dispatch falls through to the full tier-2/exact-scan chain and stays exact."""
    from mlvectordb_tpu.ops.pallas_knn_t import sweep_err_norms

    n = 32 * DB_TILE
    k, r1 = 32, 16
    db_np = rng.standard_normal((n, D)).astype(np.float32) * 4.0
    q_np = rng.standard_normal((16, D)).astype(np.float32)
    for b in range(9):  # 9 poisoned slots, each overflowing its own tile's pool
        qv = rng.standard_normal((D,)).astype(np.float32)
        q_np[b] = qv
        base = (b + 1) * DB_TILE
        for j in range(20):
            db_np[base + j * r1] = qv + rng.standard_normal(D).astype(np.float32) * 0.01
    db = jnp.asarray(db_np)
    sq = jnp.sum(db * db, axis=-1)
    q = jnp.asarray(q_np)
    valid = jnp.ones((n,), jnp.bool_)
    dp, ipx, tier = exact_knn_pallas_t(
        q, to_sweep_layout(db, dtype=jnp.bfloat16), db, valid, sq,
        k=k, metric="l2", live_prefix=n, sweep_err=sweep_err_norms(db),
        report_tier=True,
    )
    assert int(tier) >= 1
    da, ia = exact_knn(q, db, valid, sq, k=k, metric="l2", db_tile=DB_TILE)
    for b in range(16):
        assert set(np.asarray(ipx)[b].tolist()) == set(np.asarray(ia)[b].tolist()), b
