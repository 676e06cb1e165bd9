"""Itemize the certified MASKED (metadata-filter / hybrid) path vs margin mode.

VERDICT r4 weak #5: the certified 50%-filter suite row (62-80K QPS) never
recovered to margin-mode levels (90-92K) and nothing isolates where the
certified masked path loses.  This probe answers it by measuring, in ONE
process (A/B honesty, BASELINE.md):

  margin            certify=False, no resid stream       (the 90K row)
  cert-light        light=True: single pass, no resid    (what the engine's
                    adaptive dispatch actually serves until a tier-2 flip)
  cert-heavy        use_resid: +int8 resid stream + compensation matmul
                    (what suite.py's certified hybrid row measured)
  + phase-1-only and selection+rescan splits for the light/heavy variants.

Run on the real TPU:  python benchmarks/probe_hybrid.py [N_log2=20] [k=10]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

sys.path.insert(0, ".")

from benchmarks.timing import device_seconds_per_call  # noqa: E402
from mlvectordb_tpu.ops import pallas_knn_t as pkt  # noqa: E402

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
D = 128
B = 128
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def med(fn, args, runs=5, iters=8):
    device_seconds_per_call(fn, args, iters=4)
    ts = sorted(device_seconds_per_call(fn, args, iters=iters) for _ in range(runs))
    return ts[runs // 2], ts


def main():
    print(f"backend={jax.default_backend()} N={N} D={D} B={B} k={K} metric=cosine",
          flush=True)
    rng = np.random.default_rng(42)
    data_np = rng.standard_normal((N, D), dtype=np.float32)
    q_np = rng.standard_normal((B, D), dtype=np.float32)
    data = jnp.asarray(data_np)
    sq = jnp.sum(data * data, axis=-1)
    q = jnp.asarray(q_np)
    dbt = pkt.to_sweep_layout(data, dtype=jnp.bfloat16)
    resid, rscale, err2, err1 = pkt.quantize_resid(data)

    mask_np = np.ones(N, bool)
    mask_np[::2] = False  # the suite's 50%-selectivity filter
    vmask = jnp.asarray(mask_np)
    vall = jnp.ones((N,), jnp.bool_)

    # filtered oracle for the recall gate
    cos = (q_np @ data_np.T) / np.maximum(
        np.linalg.norm(q_np, axis=1)[:, None] * np.linalg.norm(data_np, axis=1)[None, :],
        1e-30,
    )
    cos_f = cos.copy()
    cos_f[:, ~mask_np] = -np.inf
    i_or = np.argpartition(-cos_f, K, axis=1)[:, :K]

    variants = [
        # (name, masked valid, certify, light, with_resid)
        ("margin  masked", vmask, False, False, False),
        ("light   masked", vmask, True, True, True),
        ("heavy   masked", vmask, True, False, True),
        ("light unmasked", vall, True, True, True),
    ]
    for name, vv0, certify, light, with_resid in variants:
        masked = vv0 is vmask
        prep = pkt.search_prep(
            B, dbt, data.dtype, vv0, sq, k=K, metric="cosine",
            live_prefix=None if masked else N, certify=certify, light=light,
            sweep_err=err2 if with_resid else None,
            resid=resid if with_resid else None,
            rscale=rscale if with_resid else None,
            err1=err1 if with_resid else None,
        )
        pl, pdef = jtu.tree_flatten(prep)

        def fn(qq, ddt, dd, vv, ss, rz, rs, e2, e1, *pleaves,
               _c=certify, _l=light, _r=with_resid, _m=masked, _pd=pdef):
            return pkt.exact_knn_pallas_t(
                qq, ddt, dd, vv, ss, k=K, metric="cosine",
                live_prefix=None if _m else N,
                sweep_err=e2 if _r else None, resid=rz if _r else None,
                rscale=rs if _r else None, err1=e1 if _r else None,
                certify=_c, light=_l, report_tier=True,
                prep=jtu.tree_unflatten(_pd, pleaves),
            )

        args = [q, dbt, data, vv0, sq, resid, rscale, err2, err1] + pl
        dists, idx, tier = fn(*args)
        idx_np = np.asarray(idx)
        if masked:
            leak = bool((~mask_np[idx_np.ravel()]).any())
            hits = sum(len(set(idx_np[b].tolist()) & set(i_or[b].tolist()))
                       for b in range(B))
            rec = hits / (B * K)
        else:
            leak, rec = False, float("nan")
        t, ts = med(fn, args)
        print(f"{name}: {t*1e3:7.3f} ms = {B/t:9,.0f} QPS  tier={int(tier)}  "
              f"recall={rec:.4f} leak={leak}  "
              f"runs={['%.2f' % (x*1e3) for x in ts]}", flush=True)

    # ---- phase-1-only splits: masked bias row vs unmasked, light vs heavy -------
    r1 = pkt._pick_r1(B, N, K)
    g = pkt.R1MAX // r1
    sfac = jax.lax.rsqrt(jnp.maximum(sq, 1e-30))
    scale_row = pkt.sweep_rows_1d(sfac).reshape(1, N)
    rs_row = pkt.sweep_rows_1d(rscale).reshape(1, N)
    for nm, vv0 in (("masked  ", vmask), ("unmasked", vall)):
        maskadd = jnp.where(vv0, 0.0, 3.0e38).astype(jnp.float32)
        bias_row = pkt.sweep_rows_1d(maskadd).reshape(1, N)
        for pname, use_res in (("light", False), ("heavy", True)):
            def p1(qq, ddt, rz, rsr, br, sr, _res=use_res):
                qh = (-qq).astype(jnp.bfloat16)
                qres = ((-qq) - qh.astype(jnp.float32)).astype(jnp.bfloat16)
                return pkt._window_mins(
                    qh, qres if _res else None, ddt, rz if _res else None,
                    rsr if _res else None, sr, br, q_tile=B, g=g,
                    transposed=True, emit_block_mins=(g == 1),
                )
            t, ts = med(p1, [q, dbt, resid, rs_row, bias_row, scale_row])
            print(f"phase1 {nm} {pname}: {t*1e3:7.3f} ms  "
                  f"runs={['%.2f' % (x*1e3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
