"""Measure per-ray occupancy-row coherence at the bench workload (CPU).

mask_raypos does one coor_occ_rows row-gather per raw depth sample
(B*R*D = 1.44M gathers at bench shapes, ~7 ms, latency-bound). Samples
along a ray are z-coherent: consecutive samples often share the same
128-lane row. This script quantifies that — per-ray counts of
consecutive-row SEGMENTS (the number of row gathers a segment-cached
formulation would issue) — to size a static per-ray row budget.

Run: JAX_PLATFORMS=cpu python scripts/rowcoherence_stats.py
"""

import os

import os as _os, sys as _sys
_d = _os.path.dirname(_os.path.abspath(__file__))
_sys.path[:0] = [_d, _os.path.dirname(_d)]
from pointnerf_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # host-keyed persistent compile cache (utils/cache.py)
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import make_workload
    from pointnerf_tpu.ops import raygen
    from pointnerf_tpu.ops.grid import voxel_coords, linearize

    opt, state, spec, grid, ts, batch = make_workload()
    gen = raygen.find_ray_generation_method("near_far_linear")
    raypos, _, _, _ = gen(batch["campos"], batch["raydir"], opt.z_depth_dim,
                          near=batch["near"], far=batch["far"],
                          jitter=0.3, key=jax.random.PRNGKey(7))
    coords, inb = voxel_coords(raypos, spec)
    lin = jnp.where(inb, linearize(coords, spec), 0)
    LW = grid["coor_occ_rows"].shape[-1]
    rid = np.asarray(lin // LW)[0]          # [R, D]
    inb = np.asarray(inb)[0]                # [R, D]
    R, D = rid.shape
    # out-of-bounds samples read row 0 (lin forced to 0) — they share one row
    segs = 1 + np.sum(rid[:, 1:] != rid[:, :-1], axis=1)     # [R]
    uniq = np.array([len(np.unique(r)) for r in rid])
    print(f"R={R} D={D} LW={LW} vdim={spec.vdim} "
          f"scaled_vsize={spec.scaled_vsize}")
    for name, v in [("segments/ray", segs), ("unique rows/ray", uniq)]:
        q = np.percentile(v, [50, 90, 99, 100])
        print(f"{name}: mean {v.mean():7.1f}  p50 {q[0]:5.0f}  "
              f"p90 {q[1]:5.0f}  p99 {q[2]:5.0f}  max {q[3]:5.0f}")
    print(f"total gathers now: {R * D}   segment-cached: {segs.sum()} "
          f"({R * D / segs.sum():.1f}x fewer)")
    print(f"in-bounds fraction: {inb.mean():.3f}")


if __name__ == "__main__":
    main()
