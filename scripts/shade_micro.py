"""Sub-phase breakdown of the shade forward at bench shapes.

Times cumulative prefixes (S-iteration scans, per-iteration key folds so the
query — and hence the gathers — can't be hoisted):

  query     render_query alone (baseline to subtract)
  +gather   + gather_neighbors on the compacted rows
  +agg      + aggregator_forward (dists/weights + fused trunk + color branch)
  +full     render_forward (march + tonemap + outputs)

Run: python scripts/shade_micro.py [--iters 64] [--superset_P 32]
"""

from __future__ import annotations

import os

import os as _os, sys as _sys
_d = _os.path.dirname(_os.path.abspath(__file__))
_sys.path[:0] = [_d, _os.path.dirname(_d)]
from pointnerf_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # host-keyed persistent compile cache (utils/cache.py)

import argparse
import json
import sys
import time


def timed(label, fn, S):
    out = fn()
    float(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        v = float(fn())
        best = min(best, time.perf_counter() - t0)
    ms = best / S * 1000.0
    print(f"{label:>10}: {ms:8.2f} ms/iter   (scalar={v:.4g})")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--rays", type=int, default=3600)
    ap.add_argument("--superset_P", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import make_workload
    from pointnerf_tpu.models.renderer import (render_query, render_forward,
                                               render_shade)
    from pointnerf_tpu.models import neural_points as npc
    from pointnerf_tpu.models.aggregator import aggregator_forward
    from pointnerf_tpu.ops.camera import w2pers
    from pointnerf_tpu.train import trainer

    import math
    rss = int(math.isqrt(args.rays))
    opt, state, spec, grid, ts, batch = make_workload(
        random_sample_size=rss, superset_P=args.superset_P)
    S = args.iters
    key0 = jax.random.PRNGKey(7)
    point_state = trainer.point_state_of(ts)
    print(f"backend={jax.default_backend()} R={args.rays} SR={opt.SR} "
          f"K={opt.K} P2={spec.superset_P}")

    def scan_of(body):
        @jax.jit
        def f():
            c, _ = jax.lax.scan(lambda c, i: (c + body(i), None),
                                jnp.float32(0), jnp.arange(S))
            return c
        return f

    def q_of(i):
        return render_query(point_state, grid, spec, opt, batch,
                            jax.random.fold_in(key0, i), is_train=True)

    def p_query(i):
        q = q_of(i)
        pidx = q.comp[2] if q.comp is not None else q.sample_pidx
        return jnp.sum(pidx) + jnp.sum(q.sample_loc_w)

    def _gathered(i):
        q = q_of(i)
        comp_src, comp_valid, c_pidx_mat, ray_valid = q.comp
        c_pidx = c_pidx_mat[:, :, None, :]
        g = npc.gather_neighbors(point_state, c_pidx, batch["camrotc2w"],
                                 batch["campos"])
        return q, g, comp_src, comp_valid

    def p_gather(i):
        q, g, _, _ = _gathered(i)
        return (jnp.sum(g["sampled_embedding"]) + jnp.sum(g["sampled_xyz"])
                + jnp.sum(q.sample_loc_w))

    def p_agg(i):
        q, g, comp_src, comp_valid = _gathered(i)
        B, R, SR = 1, args.rays, opt.SR
        RS = R * SR
        goff = (jnp.arange(B, dtype=jnp.int32) * RS)[:, None]
        gsrc = (comp_src + goff).reshape(-1)
        sample_loc = w2pers(q.sample_loc_w, batch["camrotc2w"],
                            batch["campos"])
        srd = jnp.broadcast_to(batch["raydir"][:, :, None, :],
                               sample_loc.shape)

        def compact(a, fill=0):
            flat = a.reshape((RS,) + a.shape[3:])
            out = flat[gsrc]
            Ncb = comp_src.shape[1]
            return jnp.where(
                comp_valid.reshape((Ncb,) + (1,) * (out.ndim - 1)),
                out, fill).reshape((B, Ncb, 1) + a.shape[3:])

        c_dec, _, c_w, c_conf = aggregator_forward(
            ts.agg_params, opt,
            g["sampled_color"], g["Rw2c"], g["sampled_dir"],
            g["sampled_conf"], g["sampled_embedding"],
            g["sampled_xyz_pers"], g["sampled_xyz"], g["sample_pnt_mask"],
            compact(sample_loc), compact(q.sample_loc_w), compact(srd),
            spec.vsize)
        return jnp.sum(c_dec) + jnp.sum(c_w) + jnp.sum(c_conf)

    def p_full(i):
        out = render_forward(ts.agg_params, point_state, grid, spec, opt,
                             batch, jax.random.fold_in(key0, i),
                             is_train=True)
        return jnp.sum(out["coarse_raycolor"])

    t0 = timed("query", scan_of(p_query), S)
    t1 = timed("+gather", scan_of(p_gather), S)
    t2 = timed("+agg", scan_of(p_agg), S)
    t3 = timed("+full", scan_of(p_full), S)
    print(json.dumps({
        "ms_query": round(t0, 2), "ms_gather": round(t1 - t0, 2),
        "ms_agg": round(t2 - t1, 2), "ms_march_rest": round(t3 - t2, 2),
        "ms_full_fwd": round(t3, 2)}))


if __name__ == "__main__":
    main()
