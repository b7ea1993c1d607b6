"""Micro-timings of query stages and the optimizer update on the bench workload.

python scripts/perf_micro.py [--iters 8]
"""

from __future__ import annotations

import os

import os as _os, sys as _sys
_d = _os.path.dirname(_os.path.abspath(__file__))
_sys.path[:0] = [_d, _os.path.dirname(_d)]
from pointnerf_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # host-keyed persistent compile cache (utils/cache.py)

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    S = args.iters

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import make_workload
    from pointnerf_tpu.ops import raygen
    from pointnerf_tpu.ops.query import (mask_raypos, select_shading_points,
                                         knn_neighbors_superset)
    from pointnerf_tpu.train import trainer

    opt, state, spec, grid, ts, batch = make_workload()
    key0 = jax.random.PRNGKey(7)
    print(f"backend={jax.default_backend()}")

    def timed(label, fn):
        out = fn()
        float(out)
        t0 = time.perf_counter()
        v = float(fn())
        dt = (time.perf_counter() - t0) / S * 1000.0
        print(f"{label:>24}: {dt:8.2f} ms/iter (scalar={v:.4g})")
        return dt

    gen = raygen.find_ray_generation_method("near_far_linear")

    def scan(body):
        @jax.jit
        def run():
            def b(c, i):
                return c + body(jax.random.fold_in(key0, i)), None
            c, _ = jax.lax.scan(b, jnp.float32(0), jnp.arange(S))
            return c
        return run

    def raygen_body(k):
        rp, _, _, _ = gen(batch["campos"], batch["raydir"], opt.z_depth_dim,
                          near=batch["near"], far=batch["far"], jitter=0.3,
                          key=k)
        return jnp.sum(rp)

    def mask_body(k):
        rp, _, _, _ = gen(batch["campos"], batch["raydir"], opt.z_depth_dim,
                          near=batch["near"], far=batch["far"], jitter=0.3,
                          key=k)
        return jnp.sum(mask_raypos(rp, grid, spec).astype(jnp.float32))

    def select_body(k):
        rp, _, _, _ = gen(batch["campos"], batch["raydir"], opt.z_depth_dim,
                          near=batch["near"], far=batch["far"], jitter=0.3,
                          key=k)
        v = mask_raypos(rp, grid, spec)
        loc, m = select_shading_points(rp, v, opt.SR)
        return jnp.sum(loc) + jnp.sum(m.astype(jnp.float32))

    def knn_body(k):
        rp, _, _, _ = gen(batch["campos"], batch["raydir"], opt.z_depth_dim,
                          near=batch["near"], far=batch["far"], jitter=0.3,
                          key=k)
        v = mask_raypos(rp, grid, spec)
        loc, m = select_shading_points(rp, v, opt.SR)
        pidx = knn_neighbors_superset(loc, m, grid, spec, opt.K)
        return jnp.sum(pidx).astype(jnp.float32)

    t_g = timed("raygen", scan(raygen_body))
    t_m = timed("raygen+mask", scan(mask_body))
    t_s = timed("raygen+mask+select", scan(select_body))
    t_k = timed("raygen+mask+select+knn", scan(knn_body))
    print(f"{'-> mask_raypos':>24}: {t_m - t_g:8.2f}")
    print(f"{'-> select_shading':>24}: {t_s - t_m:8.2f}")
    print(f"{'-> knn_superset':>24}: {t_k - t_s:8.2f}")

    # ---------------------------------------------------------------- optimizer
    # synthetic grads: adam cost depends only on shapes
    g_net = jax.tree.map(lambda p: jnp.full_like(p, 1e-3), ts.agg_params)
    g_pts = jax.tree.map(lambda p: jnp.full_like(p, 1e-3), ts.pt_train)

    net_tx, pts_tx = trainer.make_optimizers(opt)

    @jax.jit
    def adam_scan():
        def b(ts_c, i):
            import optax
            gn = jax.tree.map(lambda g: g * (1.0 + 1e-6 * i), g_net)
            gp = jax.tree.map(lambda g: g * (1.0 + 1e-6 * i), g_pts)
            un, sn = net_tx.update(gn, ts_c.opt_state_net, ts_c.agg_params)
            up, sp = pts_tx.update(gp, ts_c.opt_state_pts, ts_c.pt_train)
            new = ts_c._replace(
                agg_params=optax.apply_updates(ts_c.agg_params, un),
                pt_train=optax.apply_updates(ts_c.pt_train, up),
                opt_state_net=sn, opt_state_pts=sp, step=ts_c.step + 1)
            return new, None
        out, _ = jax.lax.scan(b, ts, jnp.arange(S))
        return out.step.astype(jnp.float32) + \
            jnp.sum(out.pt_train["embedding"][0])

    timed("adam only", adam_scan)

    # full train_step scan for reference
    def step_scan():
        batches = {k: (jnp.stack([v] * S) if hasattr(v, "ndim")
                       else jnp.full((S,), v, jnp.float32))
                   for k, v in batch.items()}
        _, its = trainer.train_steps_scan(ts, grid, batches, key0, opt, spec)
        return its["loss_total"][-1]
    timed("full step (scan)", step_scan)


if __name__ == "__main__":
    main()
