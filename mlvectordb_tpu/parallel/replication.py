"""ReplicationManager: replica groups over the mesh's 'replica' axis.

Realizes the reference's README-only ReplicationManager stub (replicate_write /
replicate_delete / reconcile / members — SURVEY.md §0.1, §2.2).

In the JAX single-controller model, arrays replicated over the 'replica' mesh axis are
kept consistent by XLA itself: a write scattered into a database whose sharding spec does
not partition the replica axis is applied on EVERY replica as part of the same program —
so replicate_write/replicate_delete are realized by construction rather than by explicit
message fan-out.  What remains observable (and testable) is verification: ``reconcile``
computes a content fingerprint per replica ON DEVICE via shard_map (psum of a position-
weighted checksum over each replica's local rows + liveness mask) and compares them,
returning a divergence report.  On multi-pod deployments the same fingerprints are what
replica groups exchange over DCN before serving.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .mesh import REPLICA_AXIS, SHARD_AXIS


class ReplicationManager:
    """Replica-group membership + device-side consistency verification."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.n_replicas = mesh.shape[REPLICA_AXIS]

    def members(self) -> List[int]:
        return list(range(self.n_replicas))

    # write/delete replication is performed by XLA as part of the sharded scatter (see
    # module docstring); these hooks exist for protocol parity and future multi-pod
    # fan-out, and currently validate that the target arrays are replica-consistent specs.

    def replicate_write(self, sharding) -> bool:
        """True iff the given sharding replicates over the replica axis (writes through
        it reach every member)."""
        spec = getattr(sharding, "spec", None)
        return spec is None or REPLICA_AXIS not in jax.tree_util.tree_leaves(spec)

    def replicate_delete(self, sharding) -> bool:
        return self.replicate_write(sharding)

    # ------------------------------------------------------------------ reconcile

    @functools.partial(jax.jit, static_argnames=("self",))
    def _fingerprints(self, data, valid):
        """[n_replicas] float64-ish checksums, one per replica group."""

        def local(data_loc, valid_loc):
            rows = jnp.sum(
                data_loc.astype(jnp.float32) * valid_loc[:, None].astype(jnp.float32),
                axis=1,
            )
            w = jnp.arange(1, rows.shape[0] + 1, dtype=jnp.float32)
            fp = jnp.sum(rows * w) + jnp.sum(valid_loc.astype(jnp.float32))
            # fold the shard axis so each replica group yields ONE fingerprint
            fp = jax.lax.psum(fp, SHARD_AXIS)
            return fp.reshape(1)

        return shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS)),
            out_specs=P(REPLICA_AXIS),
            check_vma=False,
        )(data, valid)

    def reconcile(self, data, valid) -> Dict[str, Any]:
        """Compare per-replica content fingerprints; report divergence."""
        fps = np.asarray(jax.device_get(self._fingerprints(data, valid)))
        consistent = bool(np.all(fps == fps[0]))
        return {
            "replicas": self.members(),
            "fingerprints": fps.tolist(),
            "consistent": consistent,
            "divergent_replicas": [] if consistent else [
                i for i, f in enumerate(fps) if f != fps[0]
            ],
        }

    # ------------------------------------------------------------------ repair

    @functools.partial(jax.jit, static_argnames=("self", "source"))
    def _broadcast_from(self, data, valid, source: int):
        """Overwrite every replica's local rows with replica ``source``'s, on device.

        One masked psum over the replica axis per array — the collective IS the
        broadcast (rides ICI), no host round trip of row data."""

        def local(d, v):
            keep = jax.lax.axis_index(REPLICA_AXIS) == source
            d2 = jax.lax.psum(
                jnp.where(keep, d.astype(jnp.float32), 0.0), REPLICA_AXIS
            ).astype(d.dtype)
            v2 = jax.lax.psum(jnp.where(keep, v.astype(jnp.int32), 0), REPLICA_AXIS) > 0
            return d2, v2

        return shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS)),
            out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS)),
            check_vma=False,
        )(data, valid)

    def repair(self, data, valid, source: int | None = None):
        """Reconcile and, on divergence, re-broadcast one healthy replica's rows to
        every member (VERDICT r2 #5 — reporting alone left no in-mesh repair path).

        ``source``: replica to copy from; default = the replica whose fingerprint the
        MAJORITY of members share (ties -> lowest replica id), matching the router's
        repair bias (api/router.py).  Returns ``(data, valid, report)`` where report
        extends reconcile()'s with ``repaired``/``source``/``consistent_after``."""
        before = self.reconcile(data, valid)
        if before["consistent"]:
            return data, valid, {**before, "repaired": False, "source": None}
        if source is None:
            fps = before["fingerprints"]
            counts: Dict[Any, int] = {}
            for f in fps:
                counts[f] = counts.get(f, 0) + 1
            best = max(counts, key=lambda f: (counts[f], -fps.index(f)))
            source = fps.index(best)
        data2, valid2 = self._broadcast_from(data, valid, source)
        after = self.reconcile(data2, valid2)
        return data2, valid2, {
            **before,
            "repaired": True,
            "source": source,
            "consistent_after": after["consistent"],
        }
