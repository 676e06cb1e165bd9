"""Test harness: force an 8-device CPU simulation BEFORE jax initializes.

Multi-chip TPU hardware is not available in CI; the sharded search / replication paths are
validated on a host-simulated 8-device mesh (SURVEY.md §4: the TPU-equivalent of the
reference's single-process tests, generalized with the numpy-oracle pattern from
reference tests/test_query_processor.py:30-33).
"""

import os

# MLVDB_TEST_TPU=1 runs the suite on the real accelerator instead of the CPU simulation
# (multi-device parallel tests will be skipped there if fewer than 8 devices exist).
_ON_TPU = os.environ.get("MLVDB_TEST_TPU") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_TPU:
    # the axon sitecustomize pins jax_platforms via config (env var alone is not enough)
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8, "host-simulated 8-device mesh required for parallel tests"


def pytest_collection_modifyitems(config, items):
    if len(jax.devices()) >= 8:
        return
    import pytest as _pytest

    skip = _pytest.mark.skip(reason="needs 8 devices (run without MLVDB_TEST_TPU)")
    for item in items:
        # test_dryrun is exempt: it spawns fresh subprocesses that build their own mesh
        if "test_parallel" in item.nodeid:
            item.add_marker(skip)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def small_config():
    from mlvectordb_tpu.config import EngineConfig

    # tiny capacities so capacity-growth and compaction paths are exercised
    return EngineConfig(
        initial_capacity=64,
        capacity_multiple=32,
        db_tile=128,
        query_buckets=(4, 16, 64),
        k_buckets=(8, 32, 128),
        use_pallas=False,
    )


def numpy_knn(q, db, k, metric):
    """Brute-force oracle matching the engine's internal distance conventions
    (ports the oracle pattern of reference tests/test_query_processor.py:30-33)."""
    q = np.asarray(q, np.float32)
    db = np.asarray(db, np.float32)
    dots = q @ db.T
    if metric == "l2":
        d = (q * q).sum(-1)[:, None] + (db * db).sum(-1)[None, :] - 2 * dots
        d = np.maximum(d, 0)
    elif metric == "ip":
        d = 1.0 - dots
    elif metric == "cosine":
        qn = np.linalg.norm(q, axis=-1)[:, None]
        dn = np.linalg.norm(db, axis=-1)[None, :]
        d = 1.0 - dots / np.maximum(qn * dn, 1e-30)
    else:
        raise ValueError(metric)
    idx = np.argsort(d, axis=-1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=-1), idx


@pytest.fixture
def oracle():
    return numpy_knn
