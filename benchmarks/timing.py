"""Honest on-device timing under the axon relay.

Host-side `block_until_ready` returns early through the tunnel (dispatch-only timing) and a
device->host readback costs ~28 ms RTT, so per-call host timing is useless.  The fix:
execute N data-dependent iterations of the op inside ONE jitted `lax.fori_loop` (the loop
carry perturbs the first argument each step so XLA cannot elide, CSE, or overlap the
iterations), read back one scalar, and difference two iteration counts to cancel the RTT
and loop constants.  The iteration count is a *dynamic* loop bound so both counts share a
single compilation.

Usage:
    t = device_seconds_per_call(fn, [carrier, big_arg1, ...])
where `fn(carrier, *rest)` and `carrier` is a SMALL float array (e.g. the query batch) —
the per-iteration serialization add touches only the carrier.  Large arrays must be passed
in `args` (never closure-captured: closures bake them into the HLO as 512MB literals and
the relay's remote-compile endpoint rejects the payload).
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _make_loop(fn: Callable):
    @jax.jit
    def loop(n, carrier, *rest):
        def body(i, state):
            acc, c = state
            out = fn(c, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            fp = jnp.asarray(leaf).astype(jnp.float32).ravel()[0]
            # iteration i+1's input must depend on iteration i's output in a way
            # XLA cannot see through, or LICM hoists fn() out of the loop and the
            # measurement reads ~0.  Arithmetic tricks fail: `fp * 0.0` constant-
            # folds, and value-based guards (isnan) fold when fn returns ints
            # (int->f32 is provably non-NaN).  optimization_barrier is the
            # documented tool: the tuple barrier makes c's next value opaque AND
            # data-dependent on fp, so iterations can neither be hoisted, CSE'd,
            # nor overlapped.
            c2, fp2 = jax.lax.optimization_barrier((c, fp))
            return acc + fp2, c2
        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), carrier))
        return acc

    return loop


def device_seconds_per_call(
    fn: Callable,
    args: Sequence,
    iters: int = 16,
    base_iters: int = 2,
) -> float:
    """Average on-device seconds per `fn(*args)` call (RTT-cancelled)."""
    loop = _make_loop(fn)
    carrier = jnp.asarray(args[0], jnp.float32)
    rest = [jnp.asarray(a) if not isinstance(a, jax.Array) else a for a in args[1:]]

    def run(n: int) -> float:
        t0 = time.perf_counter()
        np.asarray(loop(jnp.int32(n), carrier, *rest))  # readback forces completion
        return time.perf_counter() - t0

    run(base_iters)  # compile once (dynamic bound: same executable for all n)
    t_small = min(run(base_iters) for _ in range(2))
    t_big = min(run(base_iters + iters) for _ in range(2))
    return max((t_big - t_small) / iters, 1e-9)


def qps(fn: Callable, args: Sequence, batch: int, iters: int = 16) -> float:
    return batch / device_seconds_per_call(fn, args, iters=iters)
