"""Selection primitives at the k=1000 L1 shape ([128, 36512] f32, select 1141
smallest) and gather-rate microbenchmarks for the rescan.

Candidates:
  topk      : lax.top_k directly (known slow at k~1000)
  sort      : full pair bitonic sort (_sorted_topk)
  chunked   : current _topk_spec (CH=2048 speculative)
  radix     : nibble-histogram threshold (6 passes = 24 bits) + cumsum/scatter
              compaction — exact SET selection with overflow escalation, no sort

Gather (from dataw [262144, 512] f32, 146K rows of 2 KB):
  flat unsorted / flat sorted / 4 KB super-rows + onehot slice

Run: python benchmarks/probe_select_prims.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.timing import device_seconds_per_call  # noqa: E402
from mlvectordb_tpu.ops import pallas_knn_t as pkt  # noqa: E402

B, W, S = 128, 36512, 1141


def med(fn, args, runs=5, iters=8):
    device_seconds_per_call(fn, args, iters=2)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def monokey(x):
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    mask = jnp.where(u >> 31 > 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000))
    return u ^ mask


def radix_threshold(key, s, passes=6):
    """Minimal nibble-resolution t with count(key <= t) >= s, per row."""
    Bq = key.shape[0]
    prefix = jnp.zeros((Bq, 1), jnp.uint32)
    base = jnp.zeros((Bq,), jnp.int32)
    for p in range(passes):
        shift = 32 - 4 * (p + 1)
        match = (key >> (shift + 4)) == (prefix >> (shift + 4)) if p else jnp.ones(
            key.shape, jnp.bool_)
        nib = (key >> shift) & jnp.uint32(15)
        # [B, 16] counts of each nibble among prefix-matching elements
        counts = jnp.stack(
            [jnp.sum(jnp.where(match & (nib == j), 1, 0), axis=1) for j in range(16)],
            axis=1)
        cum = jnp.cumsum(counts, axis=1)                  # inclusive
        need = (s - base)[:, None]
        jstar = jnp.argmax(cum >= need, axis=1).astype(jnp.uint32)  # first covering
        below = jnp.where(jstar > 0,
                          jnp.take_along_axis(cum, (jstar[:, None] - 1).astype(jnp.int32),
                                              axis=1)[:, 0], 0)
        base = base + below
        prefix = prefix | (jstar[:, None] << shift)
    rest = jnp.uint32((1 << (32 - 4 * passes)) - 1)
    return prefix[:, 0] | rest


def radix_select(x, s, cap):
    """(positions [B, cap] int32, valid [B, cap] bool, thresh [B] f32, ok [B] bool)"""
    key = monokey(x)
    t = radix_threshold(key, s)
    mask = key <= t[:, None]
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=1)
    cnt = pos[:, -1]
    slot = jnp.where(mask, pos - 1, cap)
    slot = jnp.minimum(slot, cap)                        # overflow -> dropped column
    iota = jnp.broadcast_to(jnp.arange(x.shape[1], dtype=jnp.int32)[None, :], x.shape)
    out = jnp.zeros((x.shape[0], cap + 1), jnp.int32)
    out = out.at[jnp.arange(x.shape[0])[:, None], slot].set(iota)[:, :cap]
    validc = jnp.arange(cap, dtype=jnp.int32)[None, :] < cnt[:, None]
    # unselected values are > t_f (strict), so t_f is a sound prune threshold
    u = t
    back = jnp.where(u >> 31 > 0, u ^ jnp.uint32(0x80000000), ~u)
    t_f = jax.lax.bitcast_convert_type(back, jnp.float32)
    return out, validc, t_f, cnt <= cap


def main():
    print(f"backend={jax.default_backend()} B={B} W={W} S={S}", flush=True)
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((B, W), dtype=np.float32))

    # correctness of radix_select: set equality with sort-based reference
    posx, vmask, t_f, ok = jax.jit(lambda a: radix_select(a, S, S + 256))(x)
    xr = np.asarray(x)
    ref = np.argsort(xr, axis=1)[:, :S]
    pn, vn = np.asarray(posx), np.asarray(vmask)
    okall = True
    for b in range(B):
        got = set(pn[b][vn[b]])
        missing = set(ref[b]) - got
        if missing:
            okall = False
            print(f"  row {b}: {len(missing)} of top-{S} missing!", flush=True)
            break
    print(f"radix_select covers top-{S}: {okall}  ok={np.asarray(ok).all()}", flush=True)

    fns = [
        ("topk    ", jax.jit(lambda a: jax.lax.top_k(-a, S)[1][:, :4])),
        ("sort    ", jax.jit(lambda a: pkt._sorted_topk(a, S)[1][:, :4])),
        ("chunked ", jax.jit(lambda a: pkt._topk_spec(a, S)[1][:, :4])),
        ("radix   ", jax.jit(lambda a: radix_select(a, S, S + 256)[0][:, :4])),
    ]
    for name, fn in fns:
        t, ts = med(fn, [x])
        print(f"{name}: {t*1e3:7.3f} ms  runs={['%.2f'%(v*1e3) for v in ts]}", flush=True)

    # L2 shape too: [128, 8192] select 1141
    x2 = jnp.asarray(rng.standard_normal((B, 8192), dtype=np.float32))
    for name, fn in fns:
        t, ts = med(fn, [x2])
        print(f"L2 {name}: {t*1e3:7.3f} ms  runs={['%.2f'%(v*1e3) for v in ts]}", flush=True)

    # ---- gather rates: 146K rows of 2 KB from a 512 MB table ----------------------
    P = 262144
    dataw = jnp.asarray(rng.standard_normal((P, 512), dtype=np.float32))
    f_un = jnp.asarray(rng.integers(0, P, size=(B, S)), dtype=jnp.int32)
    f_so = jnp.sort(f_un, axis=1)

    cq = jnp.zeros((8,), jnp.float32)  # timing carrier (indices must depend on it)

    def g_flat(c, idx, dw):
        idx = idx + (c[0] != c[0]).astype(jnp.int32)  # isnan: never true, unfoldable
        return jnp.sum(dw[idx.reshape(-1)].reshape(B, S, 512), axis=(1, 2))

    def g_super(c, idx, dw):
        idx = idx + (c[0] != c[0]).astype(jnp.int32)
        sup = idx // 2
        mat = dw.reshape(P // 2, 1024)
        rows2 = mat[sup.reshape(-1)].reshape(B, S, 2, 512)
        onehot = (jnp.arange(2, dtype=jnp.int32)[None, None, :] == (idx % 2)[:, :, None])
        return jnp.sum(jnp.where(onehot[..., None], rows2, 0.0), axis=(1, 2, 3))

    gb = B * S * 2048 / 1e9
    for name, fn, idx in [
        ("flat unsorted", jax.jit(g_flat), f_un),
        ("flat sorted  ", jax.jit(g_flat), f_so),
        ("super4KB sort", jax.jit(g_super), f_so),
    ]:
        t, ts = med(fn, [cq, idx, dataw])
        print(f"gather {name}: {t*1e3:7.3f} ms ({gb/t:6.0f} GB/s)  "
              f"runs={['%.2f'%(v*1e3) for v in ts]}", flush=True)


if __name__ == "__main__":
    main()
