"""Synthetic NeRF-Synthetic-format scene fixture.

Since no real dataset exists in this environment, tests build a miniature scene
in the exact on-disk format the reference consumes (transforms_{split}.json +
RGBA PNGs + colmap_results/dense/fused.ply): a colored plate at z=0 rendered
analytically from cameras on a sphere. This exercises the full data path
(json → poses → images → rays → gt) and gives E2E training a real target.
"""

import json
import os

import numpy as np


def look_at_pose(campos, target=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)):
    """OpenGL/blender-convention c2w (camera looks along -z)."""
    campos = np.asarray(campos, np.float64)
    fwd = campos - np.asarray(target, np.float64)  # +z away from target
    fwd /= np.linalg.norm(fwd)
    right = np.cross(np.asarray(up, np.float64), fwd)
    if np.linalg.norm(right) < 1e-8:
        right = np.array([1.0, 0.0, 0.0])
    right /= np.linalg.norm(right)
    newup = np.cross(fwd, right)
    pose = np.eye(4)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = right, newup, fwd, campos
    return pose


def plate_color(x, y):
    """Color of the plate at world (x, y): smooth RGB ramp."""
    r = np.clip(x + 0.5, 0, 1)
    g = np.clip(y + 0.5, 0, 1)
    b = np.full_like(r, 0.5)
    return np.stack([r, g, b], axis=-1)


def render_plate_rgba(c2w_gl, focal, W, H, half=0.4):
    """Analytic render of the |x|,|y|<=half plate at z=0 (RGBA, blender cam)."""
    px, py = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    # blender camera: x right, y up, camera looks along -z. +0.5 pixel-center
    # offset matches get_dtu_raydir so fixture images and framework rays agree.
    dirs_cam = np.stack([(px + 0.5 - W / 2) / focal, -(py + 0.5 - H / 2) / focal,
                         -np.ones_like(px)], axis=-1)
    R, t = c2w_gl[:3, :3], c2w_gl[:3, 3]
    dirs_w = dirs_cam @ R.T
    denom = dirs_w[..., 2]
    tt = np.where(np.abs(denom) > 1e-9, (0.0 - t[2]) / denom, -1.0)
    hit = t[None, None, :] + tt[..., None] * dirs_w
    inside = (tt > 0) & (np.abs(hit[..., 0]) <= half) & (np.abs(hit[..., 1]) <= half)
    rgb = np.where(inside[..., None], plate_color(hit[..., 0], hit[..., 1]), 0.0)
    a = inside.astype(np.float64)
    return np.concatenate([rgb, a[..., None]], axis=-1)


def make_nerf_synth_scene(root, scan="plate", n_train=12, n_test=4, wh=(40, 40),
                          radius=3.0, camera_angle_x=0.6911112070083618):
    """Write a tiny scene in NeRF-Synthetic layout; returns the scene dir."""
    import imageio.v2 as imageio
    from pointnerf_tpu.data.ply import write_ply_points

    W, H = wh
    scene = os.path.join(root, scan)
    rng = np.random.RandomState(0)
    focal_native = 0.5 * 800 / np.tan(0.5 * camera_angle_x)
    focal = focal_native * W / 800.0

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
            rgba = render_plate_rgba(pose, focal, W, H)
            rel = f"./{split}/r_{i}"
            imageio.imwrite(os.path.join(scene, f"{rel}.png"),
                            (np.clip(rgba, 0, 1) * 255).astype(np.uint8))
            frames.append({"file_path": rel,
                           "rotation": 0.0,
                           "transform_matrix": pose.tolist()})
        with open(os.path.join(scene, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)

    # init point cloud: the plate, with noise — like a COLMAP fused.ply
    g = np.linspace(-0.4, 0.4, 30)
    gx, gy = np.meshgrid(g, g, indexing="ij")
    xyz = np.stack([gx, gy, np.zeros_like(gx)], -1).reshape(-1, 3)
    xyz = xyz + rng.normal(0, 0.003, xyz.shape)
    rgb = plate_color(xyz[:, 0], xyz[:, 1])
    os.makedirs(os.path.join(scene, "colmap_results/dense"), exist_ok=True)
    write_ply_points(os.path.join(scene, "colmap_results/dense/fused.ply"),
                     xyz.astype(np.float32), rgb)
    return scene


def make_tt_scene(root, scan="Truck", n_train=6, n_test=2, wh=(40, 40),
                  radius=3.0):
    """NSVF/Tanks&Temples layout: rgb/{0_,1_}*.png + pose/*.txt +
    intrinsics.txt + bbox.txt."""
    import imageio.v2 as imageio
    scene = os.path.join(root, scan)
    os.makedirs(os.path.join(scene, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(scene, "pose"), exist_ok=True)
    W, H = wh
    focal = 40.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])
    np.savetxt(os.path.join(scene, "intrinsics.txt"), np.eye(4) * 0 + np.pad(
        K, ((0, 1), (0, 1))) + np.diag([0, 0, 0, 1.0]))
    np.savetxt(os.path.join(scene, "bbox.txt"),
               np.array([-0.5, -0.5, -0.2, 0.5, 0.5, 0.2, 0.01]))
    for prefix, n in (("0", n_train), ("1", n_test)):
        for i in range(n):
            theta = 2 * np.pi * (i + (0.3 if prefix == "1" else 0)) / n
            phi = np.deg2rad(30)
            campos = radius * np.array([np.cos(theta) * np.cos(phi),
                                        np.sin(theta) * np.cos(phi),
                                        np.sin(phi)])
            pose_gl = look_at_pose(campos)
            # NSVF poses are OpenCV-convention c2w
            c2w_cv = pose_gl @ np.array([[1, 0, 0, 0], [0, -1, 0, 0],
                                         [0, 0, -1, 0], [0, 0, 0, 1.0]])
            rgba = render_plate_rgba(pose_gl, focal, W, H)
            name = f"{prefix}_{i:04d}"
            imageio.imwrite(os.path.join(scene, "rgb", name + ".png"),
                            (np.clip(rgba, 0, 1) * 255).astype(np.uint8))
            np.savetxt(os.path.join(scene, "pose", name + ".txt"), c2w_cv)
    return scene


def make_scannet_scene(root, scan="scene0101_04", n=10, wh=(40, 30)):
    """ScanNet exported/ layout with color jpgs, poses, intrinsics, depth."""
    import imageio.v2 as imageio
    scene = os.path.join(root, scan)
    exported = os.path.join(scene, "exported")
    for sub in ("color", "pose", "intrinsic", "depth"):
        os.makedirs(os.path.join(exported, sub), exist_ok=True)
    W, H = wh
    focal = 35.0
    K = np.eye(4)
    K[0, 0] = K[1, 1] = focal
    K[0, 2], K[1, 2] = W / 2, H / 2
    np.savetxt(os.path.join(exported, "intrinsic", "intrinsic_color.txt"), K)
    np.savetxt(os.path.join(exported, "intrinsic", "intrinsic_depth.txt"), K)
    for i in range(n):
        theta = 2 * np.pi * i / n
        campos = 2.5 * np.array([np.cos(theta) * 0.9, np.sin(theta) * 0.9, 0.5])
        pose_gl = look_at_pose(campos)
        c2w_cv = pose_gl @ np.array([[1, 0, 0, 0], [0, -1, 0, 0],
                                     [0, 0, -1, 0], [0, 0, 0, 1.0]])
        rgba = render_plate_rgba(pose_gl, focal, W, H)
        rgb = rgba[..., :3] * rgba[..., 3:] + 0.3 * (1 - rgba[..., 3:])
        imageio.imwrite(os.path.join(exported, "color", f"{i}.jpg"),
                        (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
        np.savetxt(os.path.join(exported, "pose", f"{i}.txt"), c2w_cv)
        # analytic z-depth of the plate in mm (0 off-plate)
        px, py = np.meshgrid(np.arange(W, dtype=np.float64),
                             np.arange(H, dtype=np.float64))
        d_cam = np.stack([(px - W / 2) / focal, (py - H / 2) / focal,
                          np.ones_like(px)], -1)
        d_w = d_cam @ c2w_cv[:3, :3].T
        t = (0.0 - campos[2]) / d_w[..., 2]
        hit = campos + t[..., None] * d_w
        inside = (t > 0.3) & (np.abs(hit[..., 0]) <= 0.4) & \
            (np.abs(hit[..., 1]) <= 0.4)
        depth_mm = np.where(inside, t * 1000.0, 0.0).astype(np.uint16)
        imageio.imwrite(os.path.join(exported, "depth", f"{i}.png"), depth_mm)
    from pointnerf_tpu.data.ply import write_ply_points
    g = np.linspace(-0.4, 0.4, 20)
    gx, gy = np.meshgrid(g, g, indexing="ij")
    xyz = np.stack([gx, gy, np.zeros_like(gx)], -1).reshape(-1, 3)
    write_ply_points(os.path.join(exported, "pcd.ply"), xyz.astype(np.float32))
    return scene


def make_llff_scene(root, scan="fern", n=9, wh=(40, 30)):
    """LLFF layout: poses_bounds.npy + images_4/."""
    import imageio.v2 as imageio
    scene = os.path.join(root, scan)
    os.makedirs(os.path.join(scene, "images_4"), exist_ok=True)
    W, H = wh
    focal = 45.0
    rows = []
    for i in range(n):
        # forward-facing: cameras on a small xy grid at z=2.5 looking at -z...
        # plate at z=0, cameras above it
        off = np.array([0.3 * ((i % 3) - 1), 0.3 * ((i // 3) - 1), 2.5])
        pose_gl = look_at_pose(off, target=(off[0] * 0.5, off[1] * 0.5, 0.0))
        rgba = render_plate_rgba(pose_gl, focal, W, H)
        rgb = rgba[..., :3] * rgba[..., 3:] + 1.0 * (1 - rgba[..., 3:])
        imageio.imwrite(os.path.join(scene, "images_4", f"image{i:03d}.png"),
                        (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
        # LLFF pose rows: [down, right, backwards] columns convention
        # inverse of the loader's correction: poses_llff = [-y, x, z, t]
        R, t = pose_gl[:3, :3], pose_gl[:3, 3]
        m = np.concatenate([-R[:, 1:2], R[:, 0:1], R[:, 2:3], t[:, None]],
                           axis=1)
        hwf = np.array([[H], [W], [focal]])
        rows.append(np.concatenate([np.concatenate([m, hwf], 1).reshape(-1),
                                    [1.5, 4.0]]))
    np.save(os.path.join(scene, "poses_bounds.npy"), np.stack(rows))
    return scene


def make_dtu_scene(root, scan="scan1", n_views=6, wh=(64, 64), radius=3.0):
    """DTU/MVSNet layout: Cameras/train/*_cam.txt (intrinsics at 1/4 scale,
    translations and depths in 200x world units), Rectified pngs per light,
    Depths_raw pfm, dtu_configs lists + pairs."""
    import imageio.v2 as imageio
    from pointnerf_tpu.data.pfm import write_pfm

    W, H = wh
    focal = 60.0
    scale = 200.0
    os.makedirs(os.path.join(root, "Cameras/train"), exist_ok=True)
    os.makedirs(os.path.join(root, f"Rectified/{scan}_train"), exist_ok=True)
    os.makedirs(os.path.join(root, f"Depths_raw/{scan}"), exist_ok=True)
    os.makedirs(os.path.join(root, "dtu_configs/lists"), exist_ok=True)

    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1.0]])
    for vid in range(n_views):
        theta = 2 * np.pi * vid / n_views
        phi = np.deg2rad(40)
        campos = radius * np.array([np.cos(theta) * np.cos(phi),
                                    np.sin(theta) * np.cos(phi), np.sin(phi)])
        pose_gl = look_at_pose(campos)
        c2w_cv = pose_gl @ np.array([[1, 0, 0, 0], [0, -1, 0, 0],
                                     [0, 0, -1, 0], [0, 0, 0, 1.0]])
        w2c = np.linalg.inv(c2w_cv)
        w2c_dtu = w2c.copy()
        w2c_dtu[:3, 3] *= scale
        depth_min_w, depth_max_w = 2.0, 4.5
        dmin_dtu = depth_min_w * scale
        dint = (depth_max_w - depth_min_w) * scale / (192 * 1.06)
        with open(os.path.join(root, f"Cameras/train/{vid:08d}_cam.txt"),
                  "w") as f:
            f.write("extrinsic\n")
            for r in w2c_dtu:
                f.write(" ".join(f"{x:.9f}" for x in r) + "\n")
            f.write("\nintrinsic\n")
            K4 = K.copy()
            K4[:2] /= 4.0  # DTU cam files store fx,fy,cx,cy at 1/4 scale
            for r in K4:
                f.write(" ".join(f"{x:.9f}" for x in r) + "\n")
            f.write(f"\n{dmin_dtu:.6f} {dint:.6f}\n")

        rgba = render_plate_rgba(pose_gl, focal, W, H)
        rgb = rgba[..., :3] * rgba[..., 3:] + 1.0 * (1 - rgba[..., 3:])
        img8 = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
        for light in range(7):
            imageio.imwrite(os.path.join(
                root, f"Rectified/{scan}_train/"
                f"rect_{vid + 1:03d}_{light}_r5000.png"), img8)

        # analytic plate depth in DTU units at the raw pfm geometry: the loader
        # halves, crops [44:556, 80:720], and resizes — emit a pfm that lands
        # back on our analytic depth after that chain: 1600x1200 raw
        rawW, rawH = 1600, 1200
        px, py = np.meshgrid(np.arange(rawW, dtype=np.float64),
                             np.arange(rawH, dtype=np.float64))
        # map raw pixel -> final pixel -> our K
        fx = (px / 2 - 80) / 640 * W
        fy = (py / 2 - 44) / 512 * H
        d_cam = np.stack([(fx - W / 2) / focal, (fy - H / 2) / focal,
                          np.ones_like(fx)], -1)
        d_w = d_cam @ c2w_cv[:3, :3].T
        t = (0.0 - campos[2]) / d_w[..., 2]
        hit = campos + t[..., None] * d_w
        inside = (t > 0) & (np.abs(hit[..., 0]) <= 0.4) & \
            (np.abs(hit[..., 1]) <= 0.4)
        depth = np.where(inside, t * scale, 0.0).astype(np.float32)
        write_pfm(os.path.join(root, f"Depths_raw/{scan}/"
                               f"depth_map_{vid:04d}.pfm"), depth)

    for split in ("train", "test", "val"):
        with open(os.path.join(root, "dtu_configs/lists",
                               f"dtu_{split}_all.txt"), "w") as f:
            f.write(scan + "\n")
    with open(os.path.join(root, "dtu_configs/dtu_pairs.txt"), "w") as f:
        f.write(f"{n_views}\n")
        for ref in range(n_views):
            srcs = [v for v in range(n_views) if v != ref][:5]
            f.write(f"{ref}\n")
            f.write(f"{len(srcs)} " +
                    " ".join(f"{v} 1.0" for v in srcs) + "\n")
    # per-scan MVS-init view bundles (reference dtu_finetune_init_pairs.txt)
    with open(os.path.join(root, "dtu_configs/dtu_finetune_init_pairs.txt"),
              "w") as f:
        f.write("3\n")
        for ref in (0, 2, 4):
            srcs = [(ref + 1) % n_views, (ref + 2) % n_views,
                    (ref + 3) % n_views]
            f.write(f"{ref}\n")
            f.write(",".join(str(s) for s in srcs) + "\n")
    with open(os.path.join(root, "dtu_configs/lists/dtu_test_ground.txt"),
              "w") as f:
        f.write(f"{scan} 0\n")
    return root
