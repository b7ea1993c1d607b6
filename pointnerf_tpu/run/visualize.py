"""Headless neural-point-cloud viewer (reference run/visualize.py + vis_grow_train.py).

The reference's viewer opens an interactive pyrender window
(run/visualize.py:46-50) through a ``build_point_cloud_visualization`` hook
that no longer exists anywhere in its model zoo — on a headless TPU pod it
cannot run at all. This driver covers the same need without a display:

* ``--ply out.ply``   export the confidence-thresholded colored cloud as a
  binary PLY (loads in MeshLab/CloudCompare/Open3D — strictly more useful
  than a blocking viewer window).
* turntable          orbit-camera z-buffer point-splat renders of the cloud
  -> PNG frames under <out>/images + an mp4/gif, mirroring the pyrender
  viewer's ``point_size`` rendering (reference run/visualize.py:50).
* ``--grow dir``      re-render every saved ``points/{step}.txt`` dump from a
  training run into one growth video (reference run/vis_grow_train.py:36-66,
  which stitches per-iteration point images with imageio).

Usage:
    python -m pointnerf_tpu.run.visualize --checkpoint ckpt_dir [--resume_iter N]
    python -m pointnerf_tpu.run.visualize --checkpoint ckpt_dir --ply cloud.ply
    python -m pointnerf_tpu.run.visualize --grow runs/exp/points --out /tmp/vis
"""
from __future__ import annotations

import argparse
import glob
import os
import re
from typing import Optional, Tuple

import numpy as np


# --------------------------------------------------------------------- loading

def load_point_cloud(checkpoint: str, resume_iter: Optional[int] = None,
                     thres: float = 0.1
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Checkpoint dir or ``*_net_ray_marching.npz`` -> (xyz, rgb01, conf).

    Points with conf <= thres are dropped (the reference thresholds its
    density grid at ``thres`` before viewing, run/visualize.py:43-45).
    """
    path = checkpoint
    if os.path.isdir(path):
        if resume_iter is None:
            cands = []
            for p in glob.glob(os.path.join(path, "*_net_ray_marching.npz")):
                m = re.match(r"^(\d+)_net_ray_marching\.npz$",
                             os.path.basename(p))
                if m:
                    cands.append(int(m.group(1)))
            if not cands:
                raise FileNotFoundError(
                    f"no *_net_ray_marching.npz checkpoints in {path}")
            resume_iter = max(cands)
        path = os.path.join(path, f"{resume_iter}_net_ray_marching.npz")
    raw = dict(np.load(path))
    xyz = np.asarray(raw["neural_points.xyz"], np.float32)
    xyz = xyz[0] if xyz.ndim == 3 else xyz
    n = len(xyz)

    def buf(key, default):
        if key not in raw:
            return default
        a = np.asarray(raw[key], np.float32)
        return a[0] if a.ndim == 3 else a

    rgb = buf("neural_points.points_color", np.full((n, 3), 0.7, np.float32))
    conf = buf("neural_points.points_conf", np.ones((n, 1), np.float32))
    conf = conf.reshape(n)
    keep = conf > thres
    return xyz[keep], np.clip(rgb[keep], 0.0, 1.0), conf[keep]


def load_points_txt(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """A ``Visualizer.save_neural_points`` dump (x y z r g b [conf]) ->
    (xyz, rgb01). Colors are stored 0-255 (to8b), see visualizer.py:91."""
    arr = np.loadtxt(path, dtype=np.float32)
    if arr.ndim == 1:
        arr = arr.reshape(1, -1)
    xyz = arr[:, :3]
    rgb = (arr[:, 3:6] / 255.0 if arr.shape[1] >= 6
           else np.full((len(xyz), 3), 0.7, np.float32))
    return xyz, np.clip(rgb, 0.0, 1.0)


# ------------------------------------------------------------------------- ply

def write_ply(path: str, xyz: np.ndarray, rgb01: np.ndarray) -> None:
    """Binary little-endian PLY: float xyz + uchar rgb."""
    n = len(xyz)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n")
    rec = np.empty(n, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
    rec["xyz"] = xyz.astype("<f4")
    rec["rgb"] = np.clip(rgb01 * 255.0 + 0.5, 0, 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        rec.tofile(f)


# ------------------------------------------------------------------ splatting

def splat_render(xyz: np.ndarray, rgb01: np.ndarray, c2w: np.ndarray,
                 H: int, W: int, focal: float, point_size: int = 2,
                 bg: float = 1.0) -> np.ndarray:
    """Z-buffer point-splat render -> [H,W,3] float01.

    Painter's order: points sorted far-to-near, each scattered over a
    point_size² pixel window; later (nearer) writes win — the same visual
    the reference's pyrender point viewer produces, minus lighting.
    """
    w2c_r = c2w[:3, :3].T
    cam = (xyz - c2w[:3, 3]) @ w2c_r.T
    z = -cam[:, 2]                                 # looking down -z
    vis = z > 1e-6
    cam, z, col = cam[vis], z[vis], rgb01[vis]
    px = focal * cam[:, 0] / z + W * 0.5
    py = -focal * cam[:, 1] / z + H * 0.5
    order = np.argsort(-z, kind="stable")          # far first, near last
    px, py, col = px[order], py[order], col[order]
    img = np.full((H * W, 3), bg, np.float32)
    half = point_size // 2
    for dy in range(-half, point_size - half):
        for dx in range(-half, point_size - half):
            ix = np.round(px + dx).astype(np.int64)
            iy = np.round(py + dy).astype(np.int64)
            ok = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            img[iy[ok] * W + ix[ok]] = col[ok]
    return img.reshape(H, W, 3)


def orbit_pose(center: np.ndarray, radius: float, azimuth: float,
               elevation: float = 0.45) -> np.ndarray:
    """Camera-to-world look-at pose on a circle around +z-up ``center``."""
    eye = center + radius * np.array([
        np.cos(azimuth) * np.cos(elevation),
        np.sin(azimuth) * np.cos(elevation),
        np.sin(elevation)], np.float32)
    fwd = center - eye
    fwd = fwd / (np.linalg.norm(fwd) + 1e-9)
    up = np.array([0.0, 0.0, 1.0], np.float32)
    right = np.cross(fwd, up)
    right /= (np.linalg.norm(right) + 1e-9)
    true_up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, true_up, -fwd, eye
    return c2w


def frame_cloud(xyz: np.ndarray) -> Tuple[np.ndarray, float]:
    center = (xyz.min(0) + xyz.max(0)) * 0.5
    radius = float(np.linalg.norm(xyz.max(0) - xyz.min(0))) * 0.9 + 1e-6
    return center.astype(np.float32), radius


def render_turntable(xyz: np.ndarray, rgb01: np.ndarray, out_dir: str,
                     n_frames: int = 60, size: int = 512,
                     point_size: int = 2, fps: int = 24) -> str:
    import imageio.v2 as imageio
    os.makedirs(out_dir, exist_ok=True)
    center, radius = frame_cloud(xyz)
    focal = size / (2.0 * np.tan(np.deg2rad(50.0) / 2.0))
    frames = []
    for i in range(n_frames):
        az = 2.0 * np.pi * i / n_frames
        img = splat_render(xyz, rgb01, orbit_pose(center, radius, az),
                           size, size, focal, point_size)
        p = os.path.join(out_dir, f"frame-{i:04d}.png")
        imageio.imwrite(p, (np.clip(img, 0, 1) * 255).astype(np.uint8))
        frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
    vid = os.path.join(out_dir, "turntable.mp4")
    try:
        imageio.mimwrite(vid, frames, fps=fps, quality=8)
    except Exception:
        vid = os.path.join(out_dir, "turntable.gif")
        imageio.mimwrite(vid, frames, duration=1.0 / fps)
    return vid


def render_grow(points_dir: str, out_dir: str, size: int = 512,
                point_size: int = 2, fps: int = 8) -> Optional[str]:
    """Growth video from a run's points/{step}.txt dumps
    (reference run/vis_grow_train.py:36-66)."""
    import imageio.v2 as imageio
    steps = []
    for p in glob.glob(os.path.join(points_dir, "*.txt")):
        m = re.match(r"^(\d+)\.txt$", os.path.basename(p))
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None
    steps.sort()
    os.makedirs(out_dir, exist_ok=True)
    # frame the FINAL cloud so the camera stays fixed while points grow in
    xyz_last, _ = load_points_txt(
        os.path.join(points_dir, f"{steps[-1]}.txt"))
    center, radius = frame_cloud(xyz_last)
    focal = size / (2.0 * np.tan(np.deg2rad(50.0) / 2.0))
    frames = []
    for i, s in enumerate(steps):
        xyz, rgb = load_points_txt(os.path.join(points_dir, f"{s}.txt"))
        az = 2.0 * np.pi * i / max(len(steps), 1) * 0.5
        img = splat_render(xyz, rgb, orbit_pose(center, radius, az),
                           size, size, focal, point_size)
        frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
    vid = os.path.join(out_dir, "grow.mp4")
    try:
        imageio.mimwrite(vid, frames, fps=fps, quality=8)
    except Exception:
        vid = os.path.join(out_dir, "grow.gif")
        imageio.mimwrite(vid, frames, duration=1.0 / fps)
    return vid


# ------------------------------------------------------------------------ main

def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", help="ckpt dir or *_net_ray_marching.npz")
    ap.add_argument("--resume_iter", type=int, default=None)
    ap.add_argument("--thres", type=float, default=0.1,
                    help="confidence threshold (reference thres, visualize.py:43)")
    ap.add_argument("--out", default="./vis")
    ap.add_argument("--ply", default=None, help="also write a binary PLY here")
    ap.add_argument("--n_frames", type=int, default=60)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--point_size", type=int, default=2)
    ap.add_argument("--grow", default=None,
                    help="points/ dir of a run -> growth video (vis_grow_train)")
    args = ap.parse_args(argv)

    if args.grow:
        vid = render_grow(args.grow, args.out, args.size, args.point_size)
        print(f"grow video: {vid}" if vid else
              f"no {args.grow}/<step>.txt dumps found")
        if not args.checkpoint:
            return
    if not args.checkpoint:
        raise SystemExit("--checkpoint or --grow required")
    xyz, rgb, conf = load_point_cloud(args.checkpoint, args.resume_iter,
                                      args.thres)
    print(f"{len(xyz)} points above conf {args.thres}")
    if args.ply:
        write_ply(args.ply, xyz, rgb)
        print(f"wrote {args.ply}")
    vid = render_turntable(xyz, rgb, args.out, args.n_frames, args.size,
                           args.point_size)
    print(f"turntable: {vid}")


if __name__ == "__main__":
    main()
