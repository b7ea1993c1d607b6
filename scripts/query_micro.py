"""Sub-phase breakdown of the world-coord query at bench shapes.

Times cumulative prefixes of the query pipeline (each as an S-iteration scan
with per-iteration key folds, host scalar fetch as the barrier):

  raygen    near_far_linear sample generation (jitter 0.3)
  +mask     + mask_raypos occupancy test (1.44M row gathers + lane select)
  +select   + select_shading_points (cumsum + top_k compaction to SR)
  +compact  + pre-KNN row compaction (cumsum + unique scatters + row gather)
  +knn      + superset KNN (full query, = perf_breakdown's "query")

Run: python scripts/query_micro.py [--iters 8] [--superset_P 32]
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
    t0 = time.perf_counter()
    v = float(fn())
    ms = (time.perf_counter() - t0) / S * 1000.0
    print(f"{label:>10}: {ms:8.2f} ms/iter   (scalar={v:.4g})")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rays", type=int, default=3600)
    ap.add_argument("--superset_P", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import make_workload
    from pointnerf_tpu.ops import raygen as rg
    from pointnerf_tpu.ops import query as q
    from pointnerf_tpu.models.renderer import effective_sr_budget
    from pointnerf_tpu.train import trainer

    import math
    rss = int(math.isqrt(args.rays))
    opt, state, spec, grid, ts, batch = make_workload(
        random_sample_size=rss, superset_P=args.superset_P)
    S = args.iters
    key0 = jax.random.PRNGKey(7)
    point_state = trainer.point_state_of(ts)
    xyz = jax.lax.stop_gradient(point_state["xyz"])
    gen = rg.find_ray_generation_method("near_far_linear")
    B, R = batch["raydir"].shape[0], batch["raydir"].shape[1]
    SR, K = opt.SR, opt.K
    Nc = effective_sr_budget(opt, B * R * SR)
    print(f"backend={jax.default_backend()} R={args.rays} SR={SR} K={K} "
          f"D={opt.z_depth_dim} P2={spec.superset_P} Nc={Nc}")

    campos, raydir = batch["campos"], batch["raydir"]

    def tvals_of(i):
        _, _, _, mid_ts = gen(campos, raydir, opt.z_depth_dim,
                              near=batch["near"], far=batch["far"], jitter=0.3,
                              key=jax.random.fold_in(key0, i))
        return mid_ts

    def scan_of(body):
        @jax.jit
        def f():
            c, _ = jax.lax.scan(lambda c, i: (c + body(i), None),
                                jnp.float32(0), jnp.arange(S))
            return c
        return f

    def p_raygen(i):
        return jnp.sum(tvals_of(i))

    def _masked(i):
        tv = tvals_of(i)
        rp = campos[:, None, None, :] + raydir[:, :, None, :] * tv[..., None]
        return tv, q.mask_raypos(rp, grid, spec)

    def p_mask(i):
        tv, v = _masked(i)
        return jnp.sum(v) + jnp.sum(tv[0, 0])

    def _selected(i):
        tv, v = _masked(i)
        t_sel, m, counts = q.select_shading_t(tv, v, SR)
        loc = jnp.where(m[..., None], campos[:, None, None, :]
                        + raydir[:, :, None, :] * t_sel[..., None], 0.0)
        return loc, m, counts

    def p_select(i):
        loc, m, counts = _selected(i)
        return jnp.sum(loc) + jnp.sum(m)

    def _compact(i):
        loc, m, counts = _selected(i)
        RS = R * SR
        Ncb = -(-Nc // B)
        rayoff = jnp.cumsum(counts, axis=-1) - counts
        n_total = rayoff[:, -1] + counts[:, -1]
        s_iota = jnp.arange(SR, dtype=jnp.int32)
        rs_iota = jnp.arange(R, dtype=jnp.int32)[:, None] * SR + s_iota
        rk = rayoff[..., None] + s_iota
        ok = (s_iota[None, None] < counts[..., None]) & (rk < Ncb)
        rank = jnp.where(ok, rk, Ncb + 1 + rs_iota[None]).reshape(B, RS)
        comp_src = jax.vmap(
            lambda r: jnp.zeros((Ncb + 1,), jnp.int32).at[r].set(
                rs_iota.reshape(-1), mode="drop",
                unique_indices=True)[:Ncb])(rank)
        comp_valid = jnp.arange(Ncb)[None] < jnp.minimum(n_total[:, None], Ncb)
        goff = (jnp.arange(B, dtype=jnp.int32) * RS)[:, None]
        c_loc = loc.reshape(B * RS, 3)[
            (comp_src + goff).reshape(-1)].reshape(B, Ncb, 3)
        return c_loc, comp_valid

    def p_compact(i):
        c_loc, comp_valid = _compact(i)
        return jnp.sum(c_loc) + jnp.sum(comp_valid)

    def p_knn(i):
        c_loc, comp_valid = _compact(i)
        c_pidx = q.knn_neighbors_superset(
            c_loc[:, :, None, :], comp_valid[:, :, None], grid, spec, K)
        return jnp.sum(c_pidx) + jnp.sum(c_loc)

    t0 = timed("raygen", scan_of(p_raygen), S)
    t1 = timed("+mask", scan_of(p_mask), S)
    t2 = timed("+select", scan_of(p_select), S)
    t3 = timed("+compact", scan_of(p_compact), S)
    t4 = timed("+knn", scan_of(p_knn), S)
    print(json.dumps({
        "ms_raygen": round(t0, 2), "ms_mask": round(t1 - t0, 2),
        "ms_select": round(t2 - t1, 2), "ms_compact": round(t3 - t2, 2),
        "ms_knn": round(t4 - t3, 2), "ms_total": round(t4, 2)}))


if __name__ == "__main__":
    main()
