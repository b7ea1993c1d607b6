"""Per-phase step-time breakdown of the bench workload on the current backend.

Times, each as a lax.scan of S iterations inside ONE dispatch (per-iteration
key folds vary the jittered ray samples so XLA cannot hoist the work out of
the loop), with a host scalar fetch as the completion barrier:

  query   raygen + voxel walk + shading-point compaction + KNN (render_query)
  forward full render (query + gather + aggregator MLP + ray march)
  grads   forward + loss + backward
  step    grads + dual Adam updates (the full train step)

Run:  python scripts/perf_breakdown.py [--iters 8] [--rays 3600]
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


def timed(label: str, fn, S: int):
    """fn: () -> scalar jax array (depends on the full chain). Returns ms/iter."""
    out = fn()
    float(out)  # compile + honest completion barrier
    t0 = time.perf_counter()
    out = fn()
    v = float(out)
    dt = time.perf_counter() - t0
    ms = dt / S * 1000.0
    print(f"{label:>10}: {ms:8.2f} ms/iter   (scalar={v:.4g})")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rays", type=int, default=3600)
    ap.add_argument("--sr-budget", type=int, default=0)
    ap.add_argument("--dtype", default=None, choices=["float32", "bfloat16"])
    ap.add_argument("--superset_P", type=int, default=None,
                    help="override preset superset_P (the remote compile "
                    "service sometimes 413-rejects the largest standalone "
                    "phase programs at P2=64; the full train step compiles)")
    ap.add_argument("--occupancy", action="store_true",
                    help="also print valid (ray,shading) row stats")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import make_workload
    from pointnerf_tpu.models.renderer import render_forward, render_query
    from pointnerf_tpu.train import trainer

    import math
    rss = int(math.isqrt(args.rays))
    assert rss * rss == args.rays, "--rays must be a perfect square"
    over = {"random_sample_size": rss}
    if args.sr_budget:
        over["SR_budget"] = args.sr_budget
    if args.dtype:
        over["compute_dtype"] = args.dtype
    if args.superset_P is not None:
        over["superset_P"] = args.superset_P
    opt, state, spec, grid, ts, batch = make_workload(**over)
    R = args.rays
    S = args.iters
    key0 = jax.random.PRNGKey(7)
    print(f"backend={jax.default_backend()} R={R} SR={opt.SR} K={opt.K} "
          f"D={opt.z_depth_dim} superset_P={spec.superset_P} "
          f"SR_budget={opt.SR_budget} iters/scan={S}")

    point_state = trainer.point_state_of(ts)

    if args.occupancy:
        q = jax.jit(lambda: render_query(point_state, grid, spec, opt, batch,
                                         key0, is_train=True))()
        pidx = q.comp[2] if q.comp is not None else q.sample_pidx
        raym = q.ray_mask
        rows_valid = jnp.any(pidx >= 0, axis=-1)
        print(f"occupancy: valid rows {float(jnp.mean(rows_valid)):.4f} "
              f"({int(jnp.sum(rows_valid))}/{rows_valid.size}), "
              f"rays hit {float(jnp.mean(raym)):.4f}, "
              f"neighbor slots filled {float(jnp.mean(pidx >= 0)):.4f}")

    @jax.jit
    def query_scan():
        def body(c, i):
            q = render_query(point_state, grid, spec, opt, batch,
                             jax.random.fold_in(key0, i), is_train=True)
            pidx = q.comp[2] if q.comp is not None else q.sample_pidx
            return c + jnp.sum(pidx) + jnp.sum(q.sample_loc_w), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(S))
        return c

    @jax.jit
    def fwd_scan():
        def body(c, i):
            out = render_forward(ts.agg_params, point_state, grid, spec, opt,
                                 batch, jax.random.fold_in(key0, i),
                                 is_train=True)
            return c + jnp.sum(out["coarse_raycolor"]), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(S))
        return c

    @jax.jit
    def grads_scan():
        def body(c, i):
            items, g_net, g_pts = trainer.compute_grads_impl(
                ts, grid, batch, jax.random.fold_in(key0, i), opt, spec)
            # consume BOTH grad groups — otherwise XLA dead-code-eliminates
            # the point-attribute scatter-add backward and its cost shows up
            # in the "adam" bucket instead
            leaves = [jnp.sum(l) for l in
                      jax.tree.leaves(g_net) + jax.tree.leaves(g_pts)]
            return c + items["loss_total"] + sum(leaves), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(S))
        return c

    def step_scan():
        batches = {k: (jnp.stack([v] * S) if hasattr(v, "ndim")
                       else jnp.full((S,), v, jnp.float32))
                   for k, v in batch.items()}
        new_ts, items = trainer.train_steps_scan(ts, grid, batches, key0, opt,
                                                 spec)
        return items["loss_total"][-1]

    @jax.jit
    def adam_only_scan():
        # the optimizer update in ISOLATION: fixed synthetic grads, scan of
        # tx.update + apply_updates over the real TrainState. Separates true
        # Adam cost from the "step - grads" bucket (which also pays for
        # whatever fusion XLA moves across the grads/update boundary).
        net_tx, pts_tx = trainer.make_optimizers(opt)
        g_net = jax.tree.map(lambda p: jnp.full_like(p, 1e-6), ts.agg_params)
        g_pts = jax.tree.map(lambda p: jnp.full_like(p, 1e-6), ts.pt_train)

        def body(carry, i):
            agg, pts, os_net, os_pts = carry
            gn = jax.tree.map(lambda g: g * (1.0 + 1e-6 * i), g_net)
            gp = jax.tree.map(lambda g: g * (1.0 + 1e-6 * i), g_pts)
            upd_n, os_net = net_tx.update(gn, os_net, agg)
            upd_p, os_pts = pts_tx.update(gp, os_pts, pts)
            import optax
            return (optax.apply_updates(agg, upd_n),
                    optax.apply_updates(pts, upd_p), os_net, os_pts), None
        carry0 = (ts.agg_params, ts.pt_train, ts.opt_state_net,
                  ts.opt_state_pts)
        (agg, pts, _, _), _ = jax.lax.scan(body, carry0,
                                           jnp.arange(S, dtype=jnp.float32))
        return sum(jnp.sum(l) for l in jax.tree.leaves(pts)) + \
            sum(jnp.sum(l) for l in jax.tree.leaves(agg))

    t_query = timed("query", query_scan, S)
    t_fwd = timed("forward", fwd_scan, S)
    t_grads = timed("grads", grads_scan, S)
    t_step = timed("step", step_scan, S)
    t_adam = timed("adam-only", adam_only_scan, S)

    print(json.dumps({
        "rays": R, "ms_query": round(t_query, 2), "ms_forward": round(t_fwd, 2),
        "ms_shade_fwd": round(t_fwd - t_query, 2),
        "ms_backward": round(t_grads - t_fwd, 2),
        "ms_adam": round(t_step - t_grads, 2),
        "ms_adam_isolated": round(t_adam, 2),
        "ms_step": round(t_step, 2),
        "rays_per_sec": round(R / t_step * 1000.0, 1),
    }))


if __name__ == "__main__":
    main()
