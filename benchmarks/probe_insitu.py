"""Why does the k=1000 rescan gather+score cost ~5.5 ms in situ when the same
shapes run 1.8 ms standalone (probe_rescan_form V2, carrier-tied indices)?

Variants (margin-form structure, gaussian 1M x 128, B=128):

  P0  full margin path (control — the production program minus the certificate)
  R2  same program, but the rescan uses PRECOMPUTED carrier-tied indices while
      the selection chain still runs (its output folded cheaply into the
      result): isolates the index-dependency/scheduling effect from the work
  R4a selection-only program (sweep + level-2 + refine -> window ids)
  R4b rescan-only program (gather + score + final top-k from id args)
      -> R4a + R4b vs P0 = what a two-dispatch split would buy
  R5  full path with the scoring chunked (lax.map over id chunks) to bound the
      live gathered-sub buffer

Run: python benchmarks/probe_insitu.py [N_log2=20] [k=1000]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.timing import device_seconds_per_call  # noqa: E402
from mlvectordb_tpu.ops import pallas_knn_t as pkt  # noqa: E402

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
D, B = 128, 128
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1000


def med(fn, args, runs=5, iters=8):
    device_seconds_per_call(fn, args, iters=2)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def main():
    print(f"backend={jax.default_backend()} N={N} B={B} k={K}", flush=True)
    rng = np.random.default_rng(42)
    data = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32))
    sq = jnp.sum(data * data, axis=-1)
    q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
    dbt = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)
    bias_row = pkt.sweep_rows_1d(sq).reshape(1, N)

    r1 = pkt._pick_r1(B, N, K)
    g = pkt.R1MAX // r1
    P = N // r1
    s1 = min(2 * K, K + 16)
    f_np = np.sort(rng.integers(0, P, size=(B, s1)), axis=1).astype(np.int32)
    f0 = jnp.asarray(f_np)
    print(f"r1={r1} P={P} s1={s1}", flush=True)

    def wmins(qq, ddt, br):
        qh = (-2.0 * qq.astype(jnp.float32)).astype(jnp.bfloat16)
        return pkt._window_mins(qh, None, ddt, None, None, None, br,
                                q_tile=B, g=g)

    def select(qq, ddt, br):
        """sweep + level-2 + refine -> (sorted window ids, l1 values)."""
        wmin = wmins(qq, ddt, br)
        qq32 = qq.astype(jnp.float32)
        qn_row = jnp.sum(qq32 * qq32, axis=-1)[:, None]
        # reuse production selection by running it with a 1-row rescan? no —
        # call the internal pieces directly, mirroring _select_and_rescan
        r2 = pkt.R2
        W2 = P // r2
        wmin3 = wmin.reshape(B, W2, r2)
        wmin2 = wmin3.min(axis=-1)
        s2 = min(s1, W2)
        v2, w2i = pkt._topk_min(wmin2, s2)
        w2i = jnp.sort(w2i, axis=1)
        G = max(1, 512 // (r2 * 4))
        sup = w2i // G
        mat = wmin.reshape(B * (W2 // G), G * r2)
        gidx = sup + (jnp.arange(B, dtype=sup.dtype) * (W2 // G))[:, None]
        rows4 = mat[gidx.reshape(-1)].reshape(B, s2, G, r2)
        onehot = (jnp.arange(G, dtype=jnp.int32)[None, None, :]
                  == (w2i % G)[:, :, None])
        l1_blk = jnp.sum(jnp.where(onehot[..., None], rows4, 0.0), axis=2)
        v1, pos, floor = pkt._topk_spec(l1_blk.reshape(B, s2 * r2), s1)
        w2sel = jnp.take_along_axis(w2i, pos // r2, axis=1)
        p = w2sel * r2 + pos % r2
        f = jnp.sort(pkt._pos_to_window(p, g), axis=1)
        return f, qn_row

    def rescan(qq, f, dd):
        qq32 = qq.astype(jnp.float32)
        qn_row = jnp.sum(qq32 * qq32, axis=-1)[:, None]
        dataw = dd.reshape(P, r1 * D)
        sub = dataw[f.reshape(-1)].reshape(B, s1 * r1, D)
        dots = jnp.sum(sub * qq32[:, None, :], axis=-1)
        sqn_c = jnp.sum(sub * sub, axis=-1)
        dist = jnp.maximum(qn_row + sqn_c - 2.0 * dots, 0.0)
        return pkt._topk_min(dist, K)

    def p0(qq, ddt, br, dd):
        f, _ = select(qq, ddt, br)
        return rescan(qq, f, dd)

    def r2_precomp(qq, ff, ddt, br, dd):
        f_sel, _ = select(qq, ddt, br)
        d, i = rescan(qq, ff + (qq[0, 0] != qq[0, 0]).astype(jnp.int32), dd)
        # consume the selection output cheaply so it isn't dead code
        return d + f_sel[:, :1].astype(jnp.float32), i

    def r4a(qq, ddt, br):
        f, _ = select(qq, ddt, br)
        return f

    def r4b(qq, ff, dd):
        return rescan(qq, ff + (qq[0, 0] != qq[0, 0]).astype(jnp.int32), dd)

    def r5_chunked(qq, ddt, br, dd):
        f, _ = select(qq, ddt, br)
        qq32 = qq.astype(jnp.float32)
        qn_row = jnp.sum(qq32 * qq32, axis=-1)[:, None]
        dataw = dd.reshape(P, r1 * D)
        CH = 8
        fch = f.reshape(B, CH, s1 // CH)

        def score(ff):
            sub = jnp.take(dataw, ff.reshape(-1), axis=0).reshape(B, -1, D)
            dots = jnp.sum(sub * qq32[:, None, :], axis=-1)
            sqn_c = jnp.sum(sub * sub, axis=-1)
            return jnp.maximum(qn_row + sqn_c - 2.0 * dots, 0.0)

        dist = jax.lax.map(score, fch.transpose(1, 0, 2))  # [CH, B, (s1/CH)*r1]
        dist = dist.transpose(1, 0, 2).reshape(B, s1 * r1)
        return pkt._topk_min(dist, K)

    t0, ts = med(jax.jit(p0), [q, dbt, bias_row, data])
    print(f"P0 full          : {t0*1e3:7.3f} ms  runs={['%.2f'%(x*1e3) for x in ts]}",
          flush=True)
    t, ts = med(jax.jit(r2_precomp), [q, f0, dbt, bias_row, data])
    print(f"R2 precomp-ids   : {t*1e3:7.3f} ms  runs={['%.2f'%(x*1e3) for x in ts]}",
          flush=True)
    ta, ts = med(jax.jit(r4a), [q, dbt, bias_row])
    print(f"R4a select-only  : {ta*1e3:7.3f} ms  runs={['%.2f'%(x*1e3) for x in ts]}",
          flush=True)
    tb, ts = med(jax.jit(r4b), [q, f0, data])
    print(f"R4b rescan-only  : {tb*1e3:7.3f} ms  runs={['%.2f'%(x*1e3) for x in ts]}",
          flush=True)
    print(f"R4a+R4b          : {(ta+tb)*1e3:7.3f} ms  (split-dispatch bound)",
          flush=True)
    t, ts = med(jax.jit(r5_chunked), [q, dbt, bias_row, data])
    print(f"R5 chunked score : {t*1e3:7.3f} ms  runs={['%.2f'%(x*1e3) for x in ts]}",
          flush=True)


if __name__ == "__main__":
    main()
