"""Isolate the superset-KNN sub-stages on the bench workload.

python scripts/perf_knn.py [--iters 8]
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

    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import make_workload
    from pointnerf_tpu.ops import raygen
    from pointnerf_tpu.ops.grid import voxel_coords, linearize
    from pointnerf_tpu.ops.query import mask_raypos, select_shading_points

    opt, state, spec, grid, ts, batch = make_workload()
    key0 = jax.random.PRNGKey(7)
    K = opt.K
    P2 = spec.superset_P
    print(f"backend={jax.default_backend()} P2={P2} K={K}")

    gen = raygen.find_ray_generation_method("near_far_linear")

    def front(k):
        rp, _, _, _ = gen(batch["campos"], batch["raydir"], opt.z_depth_dim,
                          near=batch["near"], far=batch["far"], jitter=0.3,
                          key=k)
        v = mask_raypos(rp, grid, spec)
        loc, m = select_shading_points(rp, v, opt.SR)
        return loc, m

    def timed(label, body):
        @jax.jit
        def run():
            def b(c, i):
                return c + body(jax.random.fold_in(key0, i)), None
            c, _ = jax.lax.scan(b, jnp.float32(0), jnp.arange(S))
            return c
        float(run())
        t0 = time.perf_counter()
        v = float(run())
        dt = (time.perf_counter() - t0) / S * 1000.0
        print(f"{label:>18}: {dt:8.2f} ms/iter (scalar={v:.4g})")
        return dt

    def upto_slot(k):
        loc, m = front(k)
        coords, inb = voxel_coords(loc, spec)
        lin = jnp.where(inb, linearize(coords, spec), 0)
        slot = jnp.where(inb & m, grid["coor_slot"][lin], -1)
        return jnp.sum(slot).astype(jnp.float32)

    def upto_gather(k):
        loc, m = front(k)
        coords, inb = voxel_coords(loc, spec)
        lin = jnp.where(inb, linearize(coords, spec), 0)
        slot = jnp.where(inb & m, grid["coor_slot"][lin], -1)
        rows = grid["super_xyz"][jnp.maximum(slot, 0).reshape(-1)]
        return jnp.sum(rows)

    def upto_d2(k):
        loc, m = front(k)
        B, R, SR, _ = loc.shape
        Sn = B * R * SR
        coords, inb = voxel_coords(loc, spec)
        lin = jnp.where(inb, linearize(coords, spec), 0)
        slot = jnp.where(inb & m, grid["coor_slot"][lin], -1)
        rows = grid["super_xyz"][jnp.maximum(slot, 0).reshape(-1)]
        l2 = loc.reshape(Sn, 3)
        tiled = jnp.concatenate([jnp.repeat(l2, P2, axis=-1),
                                 jnp.zeros((Sn, P2), l2.dtype)], axis=-1)
        diff = rows - tiled
        keep3 = np.zeros((4 * P2, P2), np.float32)
        for a in range(3):
            keep3[a * P2:(a + 1) * P2] = np.eye(P2, dtype=np.float32)
        d2 = jnp.square(diff) @ jnp.asarray(keep3)
        return jnp.sum(jnp.minimum(d2, 1.0))

    def upto_topk(k):
        loc, m = front(k)
        B, R, SR, _ = loc.shape
        Sn = B * R * SR
        coords, inb = voxel_coords(loc, spec)
        lin = jnp.where(inb, linearize(coords, spec), 0)
        slot = jnp.where(inb & m, grid["coor_slot"][lin], -1)
        rows = grid["super_xyz"][jnp.maximum(slot, 0).reshape(-1)]
        l2 = loc.reshape(Sn, 3)
        tiled = jnp.concatenate([jnp.repeat(l2, P2, axis=-1),
                                 jnp.zeros((Sn, P2), l2.dtype)], axis=-1)
        diff = rows - tiled
        keep3 = np.zeros((4 * P2, P2), np.float32)
        for a in range(3):
            keep3[a * P2:(a + 1) * P2] = np.eye(P2, dtype=np.float32)
        d2 = jnp.square(diff) @ jnp.asarray(keep3)
        neg, arg = jax.lax.top_k(-d2, K)
        return jnp.sum(neg) + jnp.sum(arg).astype(jnp.float32)

    t0 = timed("front(select)", lambda k: jnp.sum(front(k)[0]))
    t1 = timed("+slot", upto_slot)
    t2 = timed("+row gather", upto_gather)
    t3 = timed("+d2", upto_d2)
    t4 = timed("+top_k", upto_topk)
    print(f"{'slot':>18}: {t1 - t0:8.2f}")
    print(f"{'row gather':>18}: {t2 - t1:8.2f}")
    print(f"{'d2':>18}: {t3 - t2:8.2f}")
    print(f"{'top_k':>18}: {t4 - t3:8.2f}")


if __name__ == "__main__":
    main()
