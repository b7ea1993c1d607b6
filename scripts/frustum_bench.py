"""Frustum (dtu_inf) path on the real TPU (VERDICT r2 item 3: the
perspective querier had only ever run under CPU oracle tests).

Measures, at the dtu_inf preset's production shapes (640x512 images,
vdim 320x256x400 = 32.7M frustum voxels, max_o=1e6, P=20, SR=40, K=8):

  * per-camera frustum grid build ms (reference rebuilds per query_points
    call, query_point_indices.py:92-94),
  * per-chunk query ms at the preset's 48^2-ray chunks,
  * full 640x512 feed-forward render seconds (143 chunks; grid built once
    per camera and reused across chunks — the reference rebuilds per chunk).

Run:  python scripts/frustum_bench.py [--points 300000] [--full-image]
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

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=300000)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--full-image", action="store_true")
    ap.add_argument("--superset_P", type=int, default=0,
                    help="frustum_superset_P: per-voxel candidate supersets "
                         "on the serving path (0 = exact 27-tile scan)")
    ap.add_argument("--sr-budget", type=int, default=None,
                    help="override opt.SR_budget (preset: -1 auto pre-KNN "
                         "compaction; 0 = exact uncompacted query)")
    ap.add_argument("--scene", choices=("dense", "surface"), default="dense",
                    help="dense: 30%% volumetric scatter, ~100%% ray hit "
                         "(worst case). surface: shell-only cloud over the "
                         "central 70%% of the image — realistic DTU-like "
                         "sparsity where the pre-KNN compaction engages")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from pointnerf_tpu.config import dtu_inf_preset
    from pointnerf_tpu.models import neural_points as npc
    from pointnerf_tpu.models.renderer import render_forward
    from pointnerf_tpu.ops.frustum import (build_frustum_grid,
                                           make_frustum_spec,
                                           query_frustum_points)
    from pointnerf_tpu.train import trainer

    opt = dtu_inf_preset("scan1", frustum_superset_P=args.superset_P)
    if args.sr_budget is not None:
        opt = opt.replace(SR_budget=args.sr_budget)
    W, H = opt.img_wh
    rng = np.random.RandomState(0)

    # DTU-like intrinsics / camera; synthetic cloud filling the frustum
    K = np.array([[360.0, 0.0, W / 2], [0.0, 360.0, H / 2], [0.0, 0.0, 1.0]],
                 np.float32)
    near, far = 2.125, 4.525
    campos = np.zeros((1, 3), np.float32)
    camrot = np.eye(3, dtype=np.float32)[None]        # c2w: cam +z into scene

    # points: a noisy surface shell at mid depth + volumetric scatter,
    # expressed in world = camera frame (identity pose)
    n = args.points
    if args.scene == "surface":
        px = rng.uniform(0.15 * W, 0.85 * W, n)
        py = rng.uniform(0.15 * H, 0.85 * H, n)
        z = (3.0 + 0.4 * np.sin(px / W * 9) * np.cos(py / H * 7)
             + rng.normal(0, 0.02, n)).astype(np.float32)
    else:
        px = rng.uniform(0, W, n)
        py = rng.uniform(0, H, n)
        z_surface = 3.0 + 0.4 * np.sin(px / W * 9) * np.cos(py / H * 7) \
            + rng.normal(0, 0.02, n)
        z_vol = rng.uniform(near, far, n)
        z = np.where(rng.rand(n) < 0.7, z_surface, z_vol).astype(np.float32)
    x = (px - K[0, 2]) / K[0, 0] * z
    y = (py - K[1, 2]) / K[1, 1] * z
    xyz = np.stack([x, y, z], -1).astype(np.float32)

    emb = rng.uniform(-0.5, 0.5, (n, opt.point_features_dim)).astype(np.float32)
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    conf = np.full((n, 1), 0.9, np.float32)
    state = npc.create_point_cloud(xyz, emb, color, dirs, conf)

    spec = make_frustum_spec(opt, K, W, H, near, far)
    print(json.dumps({"vdim": list(spec.vdim), "max_o": spec.max_o,
                      "P": spec.P, "points": n}))

    # ---------------------------------------------------------- grid build
    fgrid, xyz_pers = build_frustum_grid(
        jnp.asarray(state["xyz"]), jnp.asarray(state["mask"]),
        jnp.asarray(camrot), jnp.asarray(campos), spec)
    float(jnp.sum(fgrid["num_occ"]))                   # compile barrier
    t0 = time.perf_counter()
    for _ in range(args.iters):
        fgrid, xyz_pers = build_frustum_grid(
            jnp.asarray(state["xyz"]), jnp.asarray(state["mask"]),
            jnp.asarray(camrot), jnp.asarray(campos), spec)
    nocc = float(jnp.sum(fgrid["num_occ"]))
    build_ms = (time.perf_counter() - t0) / args.iters * 1000.0
    print(json.dumps({"grid_build_ms": round(build_ms, 1),
                      "occupied_voxels": int(nocc)}))

    # -------------------------------------------------------------- query
    R = opt.random_sample_size ** 2
    pxs = rng.uniform(0, W, (1, R)).astype(np.float32)
    pys = rng.uniform(0, H, (1, R)).astype(np.float32)
    rd = np.stack([(pxs - K[0, 2]) / K[0, 0],
                   (pys - K[1, 2]) / K[1, 1],
                   np.ones_like(pxs)], -1).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    raydir = jnp.asarray(rd)

    from pointnerf_tpu.models.renderer import effective_sr_budget
    Nc = effective_sr_budget(opt, R * opt.SR)
    out = query_frustum_points(raydir, jnp.asarray(camrot),
                               jnp.asarray(campos), xyz_pers, fgrid, spec,
                               SR=opt.SR, K=opt.K, Nc=Nc)
    pidx0 = out[5][2] if out[5] is not None else out[0]
    float(jnp.sum(pidx0))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = query_frustum_points(raydir, jnp.asarray(camrot),
                                   jnp.asarray(campos), xyz_pers, fgrid,
                                   spec, SR=opt.SR, K=opt.K, Nc=Nc)
    hit = float(jnp.mean(out[3]))
    overflow = int(out[4])
    query_ms = (time.perf_counter() - t0) / args.iters * 1000.0
    print(json.dumps({"query_ms_per_2304_rays": round(query_ms, 1),
                      "ray_hit_rate": round(hit, 3),
                      "sr_budget_rows": Nc, "q_overflow_rows": overflow}))

    if spec.superset_P > 0 and out[5] is None:
        # neighbor recall vs the exact 27-tile scan on the same grid (the
        # superset grid dict carries the plain tables too)
        import dataclasses
        spec_e = dataclasses.replace(spec, superset_P=0)
        out_e = query_frustum_points(raydir, jnp.asarray(camrot),
                                     jnp.asarray(campos), xyz_pers, fgrid,
                                     spec_e, SR=opt.SR, K=opt.K)
        pid_s = np.asarray(out[0]).reshape(-1, opt.K)
        pid_e = np.asarray(out_e[0]).reshape(-1, opt.K)
        inter = tot = 0
        for a, b in zip(pid_e, pid_s):
            sa = set(int(v) for v in a if v >= 0)
            if not sa:
                continue
            sb = set(int(v) for v in b if v >= 0)
            inter += len(sa & sb)
            tot += len(sa)
        print(json.dumps({"superset_P": spec.superset_P,
                          "neighbor_recall_vs_exact": round(inter / max(tot, 1), 4)}))

    if not args.full_image:
        return

    # -------------------------------------------- full 640x512 render
    # feed-forward shading (agg_intrp_order=1 preset); grid reused across
    # chunks via render_query's prebuilt-grid fast path
    ts = trainer.create_train_state(opt, jax.random.PRNGKey(0), state)
    n_chunks = (W * H) // R
    pxg, pyg = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    rdall = np.stack([(pxg - K[0, 2]) / K[0, 0],
                      (pyg - K[1, 2]) / K[1, 1],
                      np.ones_like(pxg)], -1).reshape(-1, 3).astype(np.float32)
    rdall /= np.linalg.norm(rdall, axis=-1, keepdims=True)

    batch0 = {
        "campos": jnp.asarray(campos), "camrotc2w": jnp.asarray(camrot),
        "near": near, "far": far,
        "bg_color": jnp.zeros((1, 3), jnp.float32),
    }
    point_state = trainer.point_state_of(ts)
    fgrid_srv = dict(fgrid, xyz_pers=xyz_pers)   # prebuilt-grid fast path

    # state/grid must be jit ARGUMENTS: a closure would embed the ~400MB of
    # tables as HLO constants and 413-reject the remote compile service
    def render_chunk(agg_params, ps, g, raydir_c):
        out = render_forward(agg_params, ps, g, spec, opt,
                             dict(batch0, raydir=raydir_c), key=None,
                             is_train=False)
        return out["coarse_raycolor"], out["sr_overflow"]

    jit_chunk = jax.jit(render_chunk)
    c0, _ = jit_chunk(ts.agg_params, point_state, fgrid_srv,
                      jnp.asarray(rdall[:R][None]))
    float(jnp.sum(c0))
    t0 = time.perf_counter()
    overs = []
    for ci in range(n_chunks):
        c, ov = jit_chunk(ts.agg_params, point_state, fgrid_srv,
                          jnp.asarray(rdall[ci * R:(ci + 1) * R][None]))
        overs.append(ov)   # device arrays — no host sync inside the timing
    float(jnp.sum(c))
    img_s = time.perf_counter() - t0
    total_over = int(sum(int(o) for o in overs))
    print(json.dumps({"render_640x512_s": round(img_s, 2),
                      "chunks": n_chunks,
                      "ms_per_chunk": round(img_s / n_chunks * 1000.0, 1),
                      "sr_overflow_rows_total": total_over,
                      "note": "production serving goes through render_image "
                              "whose budget ladder re-renders overflowing "
                              "groups uncompacted; overflow here quantifies "
                              "how often that happens on this scene"}))


if __name__ == "__main__":
    main()
