"""LLFF forward-facing dataset.

Reference: data/llff_ft_dataset.py — poses_bounds.npy 3x5 pose rows + depth
bounds, LLFF→opencv axis correction, pose centering, near*0.75 scale
normalization (:321-360), images_4/ downsampled images, every-holdoff-th test
split.
"""

from __future__ import annotations

import glob
import os
import numpy as np

from . import register_dataset
from .base import BaseDataset, parse_bg_color
from .nerf_synth360_ft import BLENDER2OPENCV


def normalize(v):
    return v / np.linalg.norm(v)


def average_pose(poses: np.ndarray) -> np.ndarray:
    """[N,3,4] c2w → average 3x4 (center / fwd / up, standard LLFF)."""
    center = poses[..., 3].mean(0)
    z = normalize(poses[..., 2].sum(0))
    y_ = poses[..., 1].sum(0)
    x = normalize(np.cross(y_, z))
    y = np.cross(z, x)
    return np.stack([x, y, z, center], 1)


def center_poses(poses: np.ndarray):
    """Recenter so the average pose is identity; returns ([N,3,4], avg 4x4)."""
    avg = average_pose(poses)
    avg_h = np.eye(4)
    avg_h[:3] = avg
    last = np.tile(np.array([0, 0, 0, 1.0]), (len(poses), 1, 1))
    poses_h = np.concatenate([poses, last], 1)
    centered = np.linalg.inv(avg_h) @ poses_h
    return centered[:, :3], avg_h


def gen_render_path(c2ws: np.ndarray, n_views: int = 30) -> np.ndarray:
    """Euler-interpolated camera fly-through over the given poses
    (reference: utils/util.py:34-64 — per-segment linear interpolation of
    xyz euler angles + positions, with a 360° unwrap against the first pose,
    closing the loop back to pose 0). c2ws: [N,4,4] → [N·(n_views//3),4,4]."""
    from scipy.spatial.transform import Rotation as R
    N = len(c2ws)
    weight = np.linspace(1.0, 0.0, n_views // 3, endpoint=False).reshape(-1, 1)
    rotvec, positions = [], []
    rot_interp, pos_interp = [], []
    for i in range(N):
        euler = R.from_matrix(
            c2ws[i, :3, :3]).as_euler("xyz", degrees=True).reshape(1, 3)
        if i:
            mask = np.abs(euler - rotvec[0]) > 180
            euler[mask] += 360.0
        rotvec.append(euler)
        positions.append(c2ws[i, :3, 3:].reshape(1, 3))
        if i:
            rot_interp.append(weight * rotvec[i - 1] + (1 - weight) * rotvec[i])
            pos_interp.append(
                weight * positions[i - 1] + (1 - weight) * positions[i])
    rot_interp.append(weight * rotvec[-1] + (1 - weight) * rotvec[0])
    pos_interp.append(weight * positions[-1] + (1 - weight) * positions[0])
    out = []
    for ang, pos in zip(np.concatenate(rot_interp), np.concatenate(pos_interp)):
        c2w = np.eye(4)
        c2w[:3, :3] = R.from_euler("xyz", ang, degrees=True).as_matrix()
        c2w[:3, 3] = pos
        out.append(c2w)
    return np.stack(out).astype(np.float32)


@register_dataset("llff_ft")
class LlffFtDataset(BaseDataset):

    def initialize(self, opt, split: str = "train", max_len: int = -1):
        self.opt = opt
        self.data_dir = opt.data_root
        self.scan = opt.scan
        self.split = split
        self.img_wh = (int(opt.img_wh[0]), int(opt.img_wh[1]))
        self.width, self.height = self.img_wh
        self.max_len = max_len
        self.bg_color = parse_bg_color(opt.bg_color)

        pb = np.load(os.path.join(self.data_dir, self.scan, "poses_bounds.npy"))
        poses = pb[:, :15].reshape(-1, 3, 5)
        bounds = pb[:, -2:]
        H, W, focal = poses[0, :, -1]
        self.focal = [focal * self.img_wh[0] / W, focal * self.img_wh[1] / H]

        # axis fix: LLFF [down right back] -> [right up back], then center,
        # then blender->opencv (reference: :328-339)
        poses = np.concatenate(
            [poses[..., 1:2], -poses[..., :1], poses[..., 2:4]], -1)
        poses, avg = center_poses(poses)
        near_orig = bounds.min()
        scale = near_orig * 0.75
        bounds = bounds / scale
        poses[..., 3] /= scale

        self.all_id_list = list(range(len(poses)))
        self.near_far = np.array([bounds.min() * 0.8, bounds.max() * 1.2],
                                 np.float32)
        c2ws = []
        K = np.array([[self.focal[0], 0, self.width / 2],
                      [0, self.focal[1], self.height / 2],
                      [0, 0, 1]], np.float32)
        for vid in self.all_id_list:
            c2w = np.eye(4)
            c2w[:3] = poses[vid]
            c2w = c2w @ BLENDER2OPENCV
            c2ws.append(c2w.astype(np.float32))
        self.all_c2ws = np.stack(c2ws)

        holdoff = max(2, getattr(opt, "testskip", 8))
        test_ids = self.all_id_list[::holdoff]
        train_ids = [i for i in self.all_id_list if i not in test_ids]
        self.id_list = train_ids if split in ("train", "render") else test_ids
        self.cam2worlds = self.all_c2ws[self.id_list]
        self.world2cams = np.stack([np.linalg.inv(c) for c in self.cam2worlds])
        self.intrinsics = np.tile(K[None], (len(self.id_list), 1, 1))
        self.view_id_list = []

        if split == "render":
            self.render_poses = gen_render_path(self.cam2worlds, n_views=30)
            self.total = len(self.render_poses)
            return
        self._read_images()
        self.total = len(self.id_list)

    def get_dummyrot_item(self, idx: int, rng=None):
        """Render-path item without GT, for run/render_vid."""
        rng = rng or np.random.RandomState()
        return self.make_item(None, self.intrinsics[0], self.render_poses[idx],
                              float(self.near_far[0]), float(self.near_far[1]),
                              rng, idx, full_img=True)

    def _read_images(self):
        from PIL import Image
        image_paths = sorted(
            glob.glob(os.path.join(self.data_dir, self.scan, "images_4/*")))
        if not image_paths:
            image_paths = sorted(
                glob.glob(os.path.join(self.data_dir, self.scan, "images/*")))
        self.render_gtimgs, self.alphas = [], []
        for i in self.id_list:
            img = Image.open(image_paths[i]).convert("RGB")
            if img.size != self.img_wh:
                img = img.resize(self.img_wh, Image.Resampling.LANCZOS)
            arr = np.asarray(img, np.float32) / 255.0
            self.render_gtimgs.append(arr)
            self.alphas.append(np.ones(arr.shape[:2], np.float32))

    def get_campos_ray(self):
        from ..ops.camera import get_dtu_raydir
        center = np.asarray(self.img_wh, np.float32)[None] // 2
        pos, dirs = [], []
        for i in range(len(self.id_list)):
            c2w = self.cam2worlds[i]
            pos.append(c2w[:3, 3])
            dirs.append(np.asarray(get_dtu_raydir(
                center, self.intrinsics[0], c2w[:3, :3], True))[0])
        return np.stack(pos), np.stack(dirs)

    def load_init_points(self) -> np.ndarray:
        from .ply import read_ply_points
        path = os.path.join(self.data_dir, self.scan,
                            "colmap_results/dense/fused.ply")
        xyz, _ = read_ply_points(path)
        return xyz
