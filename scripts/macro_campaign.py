"""Production-scale validation campaign on the real TPU (VERDICT r2 item 1).

Drives the FULL train_ft driver on synthetic stand-in scenes at the
reference's production shapes — 800x800 images, >=500k-point init clouds,
3600-ray train batches, 20k+ steps with prune + probe/grow live — across
three scene geometries with different grid/occupancy regimes:

  plate  a flat textured slab (thin-slab occupancy, mic-like small object)
  steps  three stacked plates with occlusion (layered occupancy, lego-like)
  shell  a textured sphere shell (curved 3D occupancy at the lego preset's
         point density, ship-like extent)

Per scene it records: held-out PSNR at 800x800, per-image render seconds at
800x800 (the reference's serving unit, run/train_ft.py:283-322), steps/s,
sr_overflow behavior, and peak device HBM. Results append to CAMPAIGN.json
and print as one JSON line per scene.

Run:  python scripts/macro_campaign.py [--steps 20000] [--scenes plate,steps,shell]
      [--quick]  (tiny shapes, CPU-able smoke test of the harness itself)
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
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


# ----------------------------------------------------------- scene fixtures
def look_at_pose(campos, target=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)):
    campos = np.asarray(campos, np.float64)
    fwd = campos - np.asarray(target, np.float64)
    fwd /= np.linalg.norm(fwd)
    right = np.cross(np.asarray(up, np.float64), fwd)
    right /= np.linalg.norm(right)
    newup = np.cross(fwd, right)
    pose = np.eye(4)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = right, newup, fwd, campos
    return pose


def _ray_grid(c2w_gl, focal, W, H):
    px, py = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    dirs_cam = np.stack([(px + 0.5 - W / 2) / focal,
                         -(py + 0.5 - H / 2) / focal,
                         -np.ones_like(px)], axis=-1)
    R, t = c2w_gl[:3, :3], c2w_gl[:3, 3]
    return dirs_cam @ R.T, t


def plate_color(x, y, tile=24.0):
    """High-frequency procedural texture (campaign v2): fine checker +
    multi-frequency stripes modulating an RGB ramp — at 800x800 a checker
    cell is ~17 px and the stripe carrier ~6 px, so SSIM/LPIPS have real
    structure to score (VERDICT r3 weak item 4)."""
    r = np.clip(x + 0.5, 0, 1) * (0.6 + 0.4 * np.sin(40.0 * x) * np.sin(40.0 * y))
    g = np.clip(y + 0.5, 0, 1) * (0.7 + 0.3 * np.sign(np.sin(60.0 * (x + y))))
    checker = ((np.floor(x * tile) + np.floor(y * tile)) % 2)
    b = 0.25 + 0.5 * checker
    return np.stack([np.clip(r, 0, 1), np.clip(g, 0, 1), b], axis=-1)


def render_plate(c2w, focal, W, H, half=0.4, z=0.0, tile=8.0):
    dirs_w, t = _ray_grid(c2w, focal, W, H)
    denom = dirs_w[..., 2]
    tt = np.where(np.abs(denom) > 1e-9, (z - t[2]) / denom, -1.0)
    hit = t[None, None, :] + tt[..., None] * dirs_w
    inside = (tt > 0) & (np.abs(hit[..., 0]) <= half) & (np.abs(hit[..., 1]) <= half)
    rgb = np.where(inside[..., None], plate_color(hit[..., 0], hit[..., 1], tile), 0.0)
    return rgb, inside, np.where(inside, tt, np.inf)


def render_steps(c2w, focal, W, H):
    """Three stacked plates (z = .12/.0/-.12, shrinking halves): nearest hit
    wins — real occlusion between layers."""
    best_rgb = np.zeros((H, W, 3))
    best_t = np.full((H, W), np.inf)
    hit_any = np.zeros((H, W), bool)
    for z, half, tint in ((0.12, 0.18, (1.0, 0.6, 0.6)),
                          (0.0, 0.30, (0.6, 1.0, 0.6)),
                          (-0.12, 0.42, (0.6, 0.6, 1.0))):
        rgb, inside, tt = render_plate(c2w, focal, W, H, half=half, z=z)
        rgb = rgb * np.asarray(tint)
        closer = inside & (tt < best_t)
        best_rgb = np.where(closer[..., None], rgb, best_rgb)
        best_t = np.where(closer, tt, best_t)
        hit_any |= inside
    return best_rgb, hit_any


def shell_color(p, r=0.45):
    n = p / (np.linalg.norm(p, axis=-1, keepdims=True) + 1e-9)
    az = np.arctan2(n[..., 1], n[..., 0])
    checker = ((np.floor(az / np.pi * 24) + np.floor(n[..., 2] * 24)) % 2)
    stripes = 0.6 + 0.4 * np.sin(60.0 * az) * np.sin(50.0 * n[..., 2])
    return np.stack([np.clip((0.5 + 0.5 * n[..., 0]) * stripes, 0, 1),
                     0.5 + 0.5 * n[..., 1],
                     0.25 + 0.5 * checker], axis=-1)


def render_shell(c2w, focal, W, H, r=0.45):
    dirs_w, t = _ray_grid(c2w, focal, W, H)
    d = dirs_w / np.linalg.norm(dirs_w, axis=-1, keepdims=True)
    b = np.sum(d * t, axis=-1)
    c = np.sum(t * t) - r * r
    disc = b * b - c
    hit = disc > 0
    tt = np.where(hit, -b - np.sqrt(np.maximum(disc, 0)), np.inf)
    hit &= tt > 0
    p = t[None, None, :] + tt[..., None] * d
    rgb = np.where(hit[..., None], shell_color(p, r), 0.0)
    return rgb, hit


def write_scene(root, geometry, wh, n_train, n_test, n_points,
                camera_angle_x=0.6911112070083618, radius=3.0):
    """NeRF-Synthetic layout scene + a >=n_points COLMAP-style init cloud."""
    import imageio.v2 as imageio
    from pointnerf_tpu.data.ply import write_ply_points

    W, H = wh
    scene = os.path.join(root, geometry)
    focal = 0.5 * 800 / np.tan(0.5 * camera_angle_x) * W / 800.0
    rng = np.random.RandomState(0)

    def render(c2w):
        if geometry == "plate":
            rgb, a, _ = render_plate(c2w, focal, W, H)
        elif geometry == "steps":
            rgb, a = render_steps(c2w, focal, W, H)
        else:
            rgb, a = render_shell(c2w, focal, W, H)
        return np.concatenate([rgb, a[..., None].astype(np.float64)], -1)

    for split, n in (("train", n_train), ("test", n_test), ("val", 2)):
        frames = []
        os.makedirs(os.path.join(scene, split), exist_ok=True)
        for i in range(n):
            theta = 2 * np.pi * (i + (0.5 if split != "train" else 0)) / n
            phi = np.deg2rad(35 + 20 * ((i % 3) - 1))
            campos = radius * np.array([np.cos(theta) * np.cos(phi),
                                        np.sin(theta) * np.cos(phi),
                                        np.sin(phi)])
            pose = look_at_pose(campos)
            rgba = render(pose)
            rel = f"./{split}/r_{i}"
            imageio.imwrite(os.path.join(scene, f"{rel}.png"),
                            (np.clip(rgba, 0, 1) * 255).astype(np.uint8))
            frames.append({"file_path": rel, "rotation": 0.0,
                           "transform_matrix": pose.tolist()})
        with open(os.path.join(scene, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)

    # init cloud (slightly noised, like COLMAP dense fusion output)
    if geometry == "plate":
        side = int(np.ceil(np.sqrt(n_points)))
        g = np.linspace(-0.4, 0.4, side)
        gx, gy = np.meshgrid(g, g, indexing="ij")
        xyz = np.stack([gx, gy, np.zeros_like(gx)], -1).reshape(-1, 3)
        rgb = plate_color(xyz[:, 0], xyz[:, 1])
    elif geometry == "steps":
        per = n_points // 3
        parts, cols = [], []
        for z, half, tint in ((0.12, 0.18, (1.0, 0.6, 0.6)),
                              (0.0, 0.30, (0.6, 1.0, 0.6)),
                              (-0.12, 0.42, (0.6, 0.6, 1.0))):
            side = int(np.ceil(np.sqrt(per)))
            g = np.linspace(-half, half, side)
            gx, gy = np.meshgrid(g, g, indexing="ij")
            p = np.stack([gx, gy, np.full_like(gx, z)], -1).reshape(-1, 3)
            parts.append(p)
            cols.append(plate_color(p[:, 0], p[:, 1]) * np.asarray(tint))
        xyz = np.concatenate(parts)
        rgb = np.concatenate(cols)
    else:
        u = rng.normal(size=(n_points, 3))
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        xyz = u * 0.45
        rgb = shell_color(xyz)
    xyz = xyz + rng.normal(0, 0.0015, xyz.shape)
    os.makedirs(os.path.join(scene, "colmap_results/dense"), exist_ok=True)
    write_ply_points(os.path.join(scene, "colmap_results/dense/fused.ply"),
                     xyz.astype(np.float32), np.clip(rgb, 0, 1))
    return scene


# ----------------------------------------------------------- scene configs
def scene_opt(geometry, root, out, wh, rays, steps, quick):
    """Per-geometry grid regimes (different vsize/max_o/ranges, like the
    reference's per-scene dev_scripts differ: config.py presets)."""
    from pointnerf_tpu.config import Options

    base = dict(
        experiment=f"{geometry}_campaign", checkpoints_dir=out, load_points=1,
        data_root=root, scan=geometry, dataset_name="nerf_synth360_ft",
        img_wh=(wh, wh), random_sample="random", random_sample_size=rays,
        near_plane=2.0, far_plane=4.5, bg_color="white",
        kernel_size=(3, 3, 3), query_size=(3, 3, 3),
        K=8, SR=24, z_depth_dim=160 if not quick else 64,
        radius_limit_scale=4.0,
        point_features_dim=32, feature_init_method="rand",
        num_feat_freqs=3, dist_xyz_freq=5, num_viewdir_freqs=4,
        shading_feature_num=256,
        shading_feature_mlp_layer1=2, shading_feature_mlp_layer3=2,
        shading_alpha_mlp_layer=1, shading_color_mlp_layer=4,
        agg_intrp_order=2, agg_distance_kernel="linear", agg_dist_pers=20,
        point_conf_mode="1", point_color_mode="1", point_dir_mode="1",
        which_tonemap_func="off", default_conf=0.4,
        lr=0.0005, plr=0.002,
        color_loss_items=("ray_masked_coarse_raycolor",
                          "ray_miss_coarse_raycolor", "coarse_raycolor"),
        color_loss_weights=(1.0, 0.0, 0.0),
        zero_one_loss_items=("conf_coefficient",),
        zero_one_loss_weights=(0.0001,),
        superset_P=64, SR_budget=-1,
        maximum_step=steps,
        prune_iter=2000, prune_thresh=0.1, prune_max_iter=steps,
        prob_freq=2000, prob_num_step=8, prob_thresh=0.7, prob_mul=0.4,
        prob_kernel_size=(3.0, 3.0, 3.0), prob_tiers=(200000,),
        print_freq=1000, save_iter_freq=steps, save_point_freq=steps,
        test_freq=steps // 2, test_num=2,
    )
    geo = {
        # thin slab: fine xy voxels, few z layers
        "plate": dict(ranges=(-0.55, -0.55, -0.1, 0.55, 0.55, 0.1),
                      vsize=(0.002, 0.002, 0.002), vscale=(2, 2, 2),
                      max_o=400000, P=12, vox_res=1200),
        # three layers + occlusion: mid voxels, taller z
        "steps": dict(ranges=(-0.55, -0.55, -0.25, 0.55, 0.55, 0.25),
                      vsize=(0.002, 0.002, 0.002), vscale=(2, 2, 2),
                      max_o=500000, P=12, vox_res=1200),
        # curved shell at the lego preset's voxel size (config.py:379)
        "shell": dict(ranges=(-0.55, -0.55, -0.55, 0.55, 0.55, 0.55),
                      vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
                      max_o=500000, P=12, vox_res=1200),
    }[geometry]
    base.update(geo)
    return Options(**base)


def peak_hbm_gb():
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        key = "peak_bytes_in_use" if "peak_bytes_in_use" in stats else \
            "bytes_in_use"
        v = stats.get(key, 0)
        return round(v / 2**30, 3) if v else None
    except Exception:
        return None


def step_peak_gb(opt, spec, ts, grid, rays):
    """Per-device live bytes during the train step, from the compiler's own
    memory analysis of the compiled program (args + temps + outputs). The
    axon tunnel's device.memory_stats() returns nothing useful (VERDICT r3
    missing item 5), so the XLA-reported figure is the honest number — it is
    what the allocator must hold while the step runs."""
    import functools
    import jax
    import jax.numpy as jnp
    from pointnerf_tpu.train import trainer
    rng = np.random.RandomState(0)
    R = rays * rays
    raydir = rng.normal(size=(1, R, 3)).astype(np.float32)
    raydir /= np.linalg.norm(raydir, axis=-1, keepdims=True)
    batch = {
        "raydir": jnp.asarray(raydir),
        "campos": jnp.zeros((1, 3), jnp.float32),
        "camrotc2w": jnp.tile(jnp.eye(3)[None], (1, 1, 1)),
        "near": np.float32(opt.near_plane), "far": np.float32(opt.far_plane),
        "bg_color": jnp.ones((1, 3), jnp.float32),
        "gt_image": jnp.zeros((1, R, 3), jnp.float32),
    }
    try:
        fn = jax.jit(functools.partial(trainer.train_step_impl,
                                       opt=opt, spec=spec))
        ma = fn.lower(ts, grid, batch, jax.random.PRNGKey(0)).compile() \
               .memory_analysis()
        total = sum(getattr(ma, a, 0) or 0 for a in
                    ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes"))
        return round(total / 2**30, 3) if total else None
    except Exception as e:
        print(f"step_peak_gb failed: {e}")
        return None


def run_scene(geometry, args):
    import jax
    from pointnerf_tpu.run import train_ft
    from pointnerf_tpu.run.common import render_image
    from pointnerf_tpu.data import create_dataset
    from pointnerf_tpu.utils.metrics import psnr as psnr_fn

    wh = 96 if args.quick else args.wh
    n_points = 2000 if args.quick else args.points
    steps = 200 if args.quick else args.steps
    rays = 24 if args.quick else args.rays

    root = tempfile.mkdtemp(prefix=f"campaign_{geometry}_")
    out = tempfile.mkdtemp(prefix=f"campaign_ckpt_{geometry}_")
    t0 = time.time()
    write_scene(root, geometry, (wh, wh), n_train=24 if not args.quick else 8,
                n_test=4 if not args.quick else 2, n_points=n_points)
    t_scene = time.time() - t0

    opt = scene_opt(geometry, root, out, wh, rays, steps, args.quick)
    t0 = time.time()
    result = train_ft.main(opt)
    t_train = time.time() - t0

    # serving number: seconds per full image at production resolution,
    # steady-state (render view 0 twice, time the second — excludes compiles);
    # full acceptance metrics (PSNR/SSIM/LPIPS, reference run/evaluate.py:34-97)
    # over EVERY held-out view (campaign v2 — VERDICT r3 missing item 2)
    from pointnerf_tpu.utils.metrics import ssim as ssim_fn, lpips_fn
    ts, grid, spec = result["state"], result["grid"], result["spec"]
    ropt = opt.replace(random_sample="no_crop")
    test_ds = create_dataset(opt, split="test")
    item = test_ds.get_item(0, full_img=True)
    maps = render_image(ts, grid, ropt, spec, item)
    t0 = time.time()
    maps = render_image(ts, grid, ropt, spec, item)
    t_image = time.time() - t0

    lp = {net: lpips_fn(net, getattr(opt, f"lpips_{net}_path", "") or None)
          for net in ("alex", "vgg")}
    per_view = {"psnr": [], "ssim": [], "lpips_alex": [], "lpips_vgg": []}
    for vi in range(len(test_ds)):
        it = item if vi == 0 else test_ds.get_item(vi, full_img=True)
        mp = maps if vi == 0 else render_image(ts, grid, ropt, spec, it)
        img = np.asarray(mp["coarse_raycolor"])
        gt = it["gt_image"].reshape(wh, wh, 3)
        per_view["psnr"].append(float(psnr_fn(gt, img)))
        per_view["ssim"].append(float(ssim_fn(gt, img)))
        for net in ("alex", "vgg"):
            if lp[net] is not None:
                per_view[f"lpips_{net}"].append(float(lp[net](gt, img)))
    metrics = {}
    for k, vals in per_view.items():
        metrics[k] = round(float(np.mean(vals)), 4) if vals else None
    img_psnr = metrics["psnr"]
    lpips_note = None
    if lp["alex"] is None or lp["vgg"] is None:
        lpips_note = ("lpips weights absent (zero-egress env; the jax LPIPS "
                      "impl is parity-tested in tests/test_lpips.py — drop "
                      "lpips_{alex,vgg}_full.pth and pass --lpips_*_path)")

    n_active = None
    try:
        from pointnerf_tpu.models import neural_points as npc
        from pointnerf_tpu.train import trainer
        n_active = int(npc.num_active(trainer.point_state_of(ts)))
    except Exception:
        pass

    row = {
        "scene": geometry, "wh": wh, "init_points": n_points,
        "active_points_final": n_active,
        "steps": result["total_steps"],
        "train_wall_s": round(t_train, 1),
        "rays_per_sec_wall": round(result["total_steps"] * rays * rays
                                   / t_train, 1),
        "final_psnr": round(result["final_psnr"], 3),
        "best_psnr": round(result["best_psnr"], 3),
        "sec_per_image_800" if wh == 800 else "sec_per_image":
            round(t_image, 2),
        # eval-path metrics over ALL held-out views. final_psnr (train loop's
        # test()) masks no rays and uses the same renderer — any delta vs
        # this average is view mix only (both render every test view here)
        "psnr": metrics["psnr"],
        "ssim": metrics["ssim"],
        "lpips_alex": metrics["lpips_alex"],
        "lpips_vgg": metrics["lpips_vgg"],
        "per_view_psnr": [round(v, 2) for v in per_view["psnr"]],
        "lpips_note": lpips_note,
        "peak_hbm_gb": peak_hbm_gb(),
        "step_peak_gb_xla": step_peak_gb(opt, spec, ts, grid, rays),
        "scene_gen_s": round(t_scene, 1),
        "backend": jax.default_backend(),
    }
    if not args.quick:  # smoke rows must not pollute the scoreboard file
        with open("CAMPAIGN.json", "a") as f:
            f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="plate,steps,shell")
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--wh", type=int, default=800)
    ap.add_argument("--rays", type=int, default=60, help="ray square side")
    ap.add_argument("--points", type=int, default=500000)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (harness smoke test; must be "
                    "set before first jax use — the axon site overrides "
                    "JAX_PLATFORMS)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    for geometry in args.scenes.split(","):
        run_scene(geometry.strip(), args)


if __name__ == "__main__":
    main()
