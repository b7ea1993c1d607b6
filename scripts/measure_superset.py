"""Quantify the superset-bucket query approximation (BASELINE.md round-1
addendum 2) against the exact kernel-neighborhood KNN.

The superset query keeps, per occupied voxel, only the superset_P candidates
nearest to the VOXEL CENTER from its kernel^3 neighborhood; a shading sample
then picks its K nearest from that row. When the neighborhood holds more
points than superset_P, samples far from the voxel center can miss true
neighbors. This script measures, on a pathological dense-cluster scene
(every neighborhood >> superset_P points):

  * neighbor recall (fraction of exact-KNN indices recovered),
  * mean neighbor-distance inflation,
  * rendered-image effect: train the tiny plate scene with the EXACT query,
    then render with each query and compare PSNR vs GT.

Run: JAX_PLATFORMS=cpu python scripts/measure_superset.py
"""

from __future__ import annotations

import os

import os as _os, sys as _sys
_d = _os.path.dirname(_os.path.abspath(__file__))
_sys.path[:0] = [_d, _os.path.dirname(_d)]
from pointnerf_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # host-keyed persistent compile cache (utils/cache.py)

import sys

import numpy as np
import jax
import jax.numpy as jnp


def neighbor_recall(superset_P: int, n_points: int = 60000, seed: int = 0):
    sys.path.insert(0, ".")
    sys.path.insert(0, "tests")
    from pointnerf_tpu.config import Options
    from pointnerf_tpu.ops.grid import make_grid_spec, build_grid
    from pointnerf_tpu.ops.query import knn_neighbors, knn_neighbors_superset

    rng = np.random.RandomState(seed)
    # dense clusters: 40 gaussian blobs, sigma ~ 1 voxel -> hundreds of
    # points per kernel neighborhood (superset capacity insufficient)
    opt = Options(vsize=(0.02, 0.02, 0.02), vscale=(1, 1, 1),
                  kernel_size=(3, 3, 3), query_size=(3, 3, 3),
                  ranges=(0.0, 0.0, 0.0, 1.0, 1.0, 1.0),
                  max_o=60000, P=16, K=8, SR=8,
                  radius_limit_scale=0.0, superset_P=superset_P)
    centers = rng.uniform(0.15, 0.85, (40, 3))
    xyz = (centers[rng.randint(0, 40, n_points)] +
           rng.normal(0, 0.02, (n_points, 3))).astype(np.float32)
    xyz = np.clip(xyz, 0.001, 0.999)
    spec = make_grid_spec(opt, points_min=xyz.min(0), points_max=xyz.max(0),
                          max_points=n_points)
    grid = build_grid(jnp.asarray(xyz), jnp.ones(n_points, bool), spec)

    # samples at random points-of-interest near the clusters
    S = 2000
    loc = (centers[rng.randint(0, 40, S)] +
           rng.normal(0, 0.025, (S, 3))).astype(np.float32).reshape(1, S, 1, 3)
    mask = jnp.ones((1, S, 1), bool)

    exact = np.asarray(knn_neighbors(
        jnp.asarray(loc), mask, jnp.asarray(xyz), grid, spec, opt.K))
    sup = np.asarray(knn_neighbors_superset(
        jnp.asarray(loc), mask, grid, spec, opt.K))

    rec, infl = [], []
    flat = loc.reshape(S, 3)
    for s in range(S):
        e = set(int(i) for i in exact[0, s, 0] if i >= 0)
        g = set(int(i) for i in sup[0, s, 0] if i >= 0)
        if not e:
            continue
        rec.append(len(e & g) / len(e))
        de = np.sort(np.linalg.norm(xyz[sorted(e)] - flat[s], axis=-1))
        if g:
            dg = np.sort(np.linalg.norm(xyz[sorted(g)] - flat[s], axis=-1))
            k = min(len(de), len(dg))
            infl.append(float(np.mean(dg[:k] / np.maximum(de[:k], 1e-9))))
    return float(np.mean(rec)), float(np.mean(infl)), len(rec)


def render_psnr_effect(superset_P: int = 32):
    """The production question: a pipeline that trains AND renders with the
    superset query vs one that trains AND renders exactly. (Mixing — train
    exact, render superset — overstates the effect: the network adapts to
    whichever neighbor sets the query yields.) Also reports the mixed
    number for reference."""
    sys.path.insert(0, ".")
    sys.path.insert(0, "tests")
    from pointnerf_tpu.train import trainer
    from pointnerf_tpu.ops.grid import make_grid_spec, build_grid
    from pointnerf_tpu.utils.metrics import psnr
    from test_end_to_end import tiny_setup, make_gt

    def run(opt, spec, grid, batch, gt, state):
        tb = dict(batch, gt_image=gt)
        ts = trainer.create_train_state(opt, jax.random.PRNGKey(1), state)
        key = jax.random.PRNGKey(2)
        for _ in range(150):
            key, sub = jax.random.split(key)
            ts, _ = trainer.train_step(ts, grid, tb, sub, opt, spec)
        return ts, trainer.eval_step(ts, grid, batch, opt, spec)

    opt, state, spec, grid, batch, xyz = tiny_setup(R_side=12)
    gt, _ = make_gt(batch)
    g = np.asarray(gt[0])
    ts_e, out_exact = run(opt, spec, grid, batch, gt, state)

    opt_s = opt.replace(superset_P=superset_P)
    spec_s = make_grid_spec(opt_s, points_min=xyz.min(0),
                            points_max=xyz.max(0), max_points=len(xyz))
    grid_s = build_grid(state["xyz"], state["mask"], spec_s)
    _, out_sup = run(opt_s, spec_s, grid_s, batch, gt, state)

    out_mixed = trainer.eval_step(ts_e, grid_s, batch, opt_s, spec_s)
    return (float(psnr(g, np.asarray(out_exact["coarse_raycolor"][0]))),
            float(psnr(g, np.asarray(out_sup["coarse_raycolor"][0]))),
            float(psnr(g, np.asarray(out_mixed["coarse_raycolor"][0]))))


def main():
    print("dense-cluster neighbor recall (60k pts, 40 blobs, K=8):")
    for P2 in (8, 16, 32, 64):
        r, inf, n = neighbor_recall(P2)
        print(f"  superset_P={P2:3d}: recall={r:.4f} "
              f"dist_inflation={inf:.4f} (n={n})")
    pe, ps, pm = render_psnr_effect(32)
    print(f"plate-scene 150-step overfit: exact-trained/exact-rendered="
          f"{pe:.3f} dB, superset-trained/superset-rendered={ps:.3f} dB "
          f"(delta {ps - pe:+.3f}), mixed exact-trained/superset-rendered="
          f"{pm:.3f} dB")


if __name__ == "__main__":
    main()
