"""Decompose the campaign shell scene's 800x800 serving render (~17 s/image).

Reconstructs the EXACT serving workload of the textured campaign shell row
(scripts/macro_campaign.py::scene_opt("shell")): ~480k-point sphere-shell
cloud, SR=24, z_depth_dim=160, superset_P=64, max_o=500k, auto SR_budget —
then times render_image per group and per ladder rung, so the 800-square
serving cost (VERDICT r4 item 2) decomposes into query / shade / ladder /
drain components.

Run:  python scripts/shell_serving_probe.py [--side 800] [--group 8]
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


def shell_workload(n_points=480_000, seed=0):
    import jax
    from pointnerf_tpu.config import Options, validate_options
    from pointnerf_tpu.models import neural_points as npc
    from pointnerf_tpu.ops.grid import make_grid_spec, build_grid
    from pointnerf_tpu.train import trainer

    opt = Options(
        kernel_size=(3, 3, 3), query_size=(3, 3, 3),
        K=8, SR=24, z_depth_dim=160, radius_limit_scale=4.0,
        point_features_dim=32, num_feat_freqs=3, dist_xyz_freq=5,
        num_viewdir_freqs=4, shading_feature_num=256,
        shading_feature_mlp_layer1=2, shading_feature_mlp_layer3=2,
        shading_alpha_mlp_layer=1, shading_color_mlp_layer=4,
        agg_intrp_order=2, agg_distance_kernel="linear", agg_dist_pers=20,
        point_conf_mode="1", point_color_mode="1", point_dir_mode="1",
        which_tonemap_func="off", default_conf=0.4,
        near_plane=2.0, far_plane=4.5, bg_color="white",
        superset_P=64, SR_budget=-1,
        random_sample_size=48, random_sample="no_crop",
        ranges=(-0.55, -0.55, -0.55, 0.55, 0.55, 0.55),
        vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
        max_o=500000, P=12,
    )
    opt = validate_options(opt)

    rng = np.random.RandomState(seed)
    # sphere shell r=0.45 (macro_campaign write_scene shell geometry)
    v = rng.normal(size=(n_points, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    xyz = (v * 0.45).astype(np.float32)
    emb = rng.uniform(-0.5, 0.5, (n_points, opt.point_features_dim)
                      ).astype(np.float32)
    color = rng.uniform(0, 1, (n_points, 3)).astype(np.float32)
    dirs = v.copy()
    conf = np.full((n_points, 1), 0.8, np.float32)

    state = npc.create_point_cloud(xyz, emb, color, dirs, conf)
    spec = make_grid_spec(opt, points_min=xyz.min(0), points_max=xyz.max(0),
                          max_points=n_points)
    grid = jax.jit(build_grid, static_argnames=("spec",))(
        state["xyz"], state["mask"], spec)
    ts = trainer.create_train_state(opt, jax.random.PRNGKey(0), state)
    return opt, state, spec, grid, ts


def camera_item(side):
    """Campaign-style camera: 3.2 from origin looking at the shell, fov such
    that the shell fills most of the frame (macro_campaign look_at_pose +
    focal = 0.7 * W)."""
    campos = np.array([2.2, 1.4, 1.6], np.float32)
    campos = campos / np.linalg.norm(campos) * 3.2
    fwd = -campos / np.linalg.norm(campos)
    up = np.array([0, 0, 1.0], np.float32)
    right = np.cross(fwd, up); right /= np.linalg.norm(right)
    up2 = np.cross(right, fwd)
    camrot = np.stack([right, -up2, fwd], -1).astype(np.float32)  # c2w, opencv
    focal = 0.7 * side
    px, py = np.meshgrid(np.arange(side), np.arange(side))
    u = (px.reshape(-1) + 0.5 - side / 2) / focal
    vv = (py.reshape(-1) + 0.5 - side / 2) / focal
    rd = np.stack([u, vv, np.ones_like(u)], -1).astype(np.float32) @ camrot.T
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return {
        "h": side, "w": side,
        "raydir": rd[None],
        "pixel_idx": np.stack([px.reshape(-1), py.reshape(-1)], -1)[None],
        "campos": campos[None],
        "camrotc2w": camrot[None],
        "near": 2.0, "far": 4.5,
        "bg_color": np.ones((1, 3), np.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=800)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--points", type=int, default=480_000)
    ap.add_argument("--rungs", type=int, default=0,
                    help="1: also time isolated rung1/rung2 group programs "
                         "(rung2 at 800-square group 8 is a known HBM OOM — "
                         "each attempt burns ~3 min of remote compile)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from pointnerf_tpu.run.common import render_image, CONST_BATCH_KEYS
    from pointnerf_tpu.models.renderer import effective_sr_budget
    from pointnerf_tpu.train import trainer
    from pointnerf_tpu.data.base import chunks_of_item

    opt, state, spec, grid, ts = shell_workload(args.points)
    side = args.side
    R = side * side
    chunk = opt.random_sample_size ** 2
    item = camera_item(side)
    print(json.dumps({
        "side": side, "chunk": chunk, "n_chunks": -(-R // chunk),
        "group": args.group, "SR": opt.SR,
        "train_budget_per_chunk": effective_sr_budget(opt, chunk * opt.SR)}),
        flush=True)

    # ---- isolated group dispatch per rung (stacked mode = production)
    const_batch = {k: jnp.asarray(item[k]) for k in CONST_BATCH_KEYS
                   if k in item}
    # pick a group from the CENTER of the image (rays that hit the shell)
    all_chunks = list(chunks_of_item(item, chunk))
    mid = len(all_chunks) // 2
    subs = [c[0] for c in all_chunks[mid: mid + args.group]]
    stacked = {"raydir": jnp.asarray(np.stack([s["raydir"] for s in subs]))}
    S_chunk = chunk * opt.SR
    Nc_eff = effective_sr_budget(opt, S_chunk)
    rung_list = [("rung0_auto", opt)]
    if args.rungs:
        rung_list += [("rung1_2x", opt.replace(SR_budget=2 * Nc_eff)),
                      ("rung2_off", opt.replace(SR_budget=0))]
    for label, o in rung_list:
        try:
            outs = trainer.eval_chunks_stacked(ts, grid, stacked, const_batch,
                                               o, spec)
            float(jnp.sum(outs["coarse_raycolor"]))
            t0 = time.perf_counter()
            for _ in range(3):
                outs = trainer.eval_chunks_stacked(ts, grid, stacked,
                                                   const_batch, o, spec)
            over = int(np.asarray(outs["sr_overflow"]).sum())
            float(jnp.sum(outs["coarse_raycolor"]))
            dt = (time.perf_counter() - t0) / 3
            print(json.dumps({
                label + "_ms_per_group": round(dt * 1000.0, 1),
                "krays_per_s": round(chunk * args.group / dt / 1e3, 1),
                "sr_overflow": over}), flush=True)
        except Exception as e:
            print(json.dumps({label: "FAILED",
                              "err": str(e)[:200]}), flush=True)

    # ---- full image through the production path
    t0 = time.perf_counter()
    maps = render_image(ts, grid, opt, spec, item, group=args.group)
    dt_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    maps = render_image(ts, grid, opt, spec, item, group=args.group)
    dt = time.perf_counter() - t0
    print(json.dumps({"render_s_cold": round(dt_cold, 2),
                      "render_s_steady": round(dt, 2),
                      "krays_per_s": round(R / dt / 1e3, 1),
                      "finite": bool(np.isfinite(
                          maps["coarse_raycolor"]).all())}), flush=True)


if __name__ == "__main__":
    main()
