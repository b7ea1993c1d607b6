"""NeRF-Synthetic 360° per-scene finetune dataset.

Reference: data/nerf_synth360_ft_dataset.py — transforms_{split}.json cameras,
blender→opencv pose flip, alpha-composited GT over the configured bg color,
spherical render path, COLMAP init point loading, init view triplets.

Design deltas:
* view triplets come from the convex hull of the camera positions (scipy)
  instead of open3d ball-pivoting (reference data_utils.py:83-120) — for the
  NeRF-synth camera sphere the hull IS the BPA surface, without the dependency;
* images are numpy float32 throughout; items are built by BaseDataset.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from . import register_dataset
from .base import BaseDataset, parse_bg_color
from .ply import read_ply_points

BLENDER2OPENCV = np.array([[1, 0, 0, 0], [0, -1, 0, 0],
                           [0, 0, -1, 0], [0, 0, 0, 1]], dtype=np.float64)


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Blender-convention spherical camera pose
    (reference: nerf_synth360_ft_dataset.py:42-69)."""
    t, p = np.deg2rad(theta_deg), np.deg2rad(phi_deg)
    trans = np.eye(4); trans[2, 3] = radius
    rphi = np.eye(4)
    rphi[1, 1], rphi[1, 2] = np.cos(p), -np.sin(p)
    rphi[2, 1], rphi[2, 2] = np.sin(p), np.cos(p)
    rth = np.eye(4)
    rth[0, 0], rth[0, 2] = np.cos(t), -np.sin(t)
    rth[2, 0], rth[2, 2] = np.sin(t), np.cos(t)
    flip = np.array([[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
                    dtype=np.float64)
    return flip @ rth @ rphi @ trans


def hull_view_triplets(cam_xyz: np.ndarray, full_comb: bool = False) -> List[List[int]]:
    """Init view triplets = triangles of the camera-position hull
    (substitutes reference triangluation_bpa, data_utils.py:83-120)."""
    from scipy.spatial import ConvexHull
    if len(cam_xyz) < 4:
        return [list(range(len(cam_xyz)))]
    hull = ConvexHull(np.asarray(cam_xyz, np.float64))
    tris = [list(map(int, s)) for s in hull.simplices]
    if full_comb:
        return tris
    # dedupe triangles sharing 2+ vertices to cover the sphere economically,
    # like the reference's non-full_comb BPA output
    seen, out = set(), []
    for t in tris:
        key = frozenset(t)
        if any(len(key & s) >= 3 for s in seen):
            continue
        seen.add(key)
        out.append(t)
    return out


@register_dataset("nerf_synth360_ft")
class NerfSynth360FtDataset(BaseDataset):

    def initialize(self, opt, split: str = "train", max_len: int = -1):
        self.opt = opt
        self.data_dir = opt.data_root
        self.scan = opt.scan
        self.split = split
        w, h = int(opt.img_wh[0]), int(opt.img_wh[1])
        self.img_wh = (w, h)
        self.width, self.height = w, h
        self.max_len = max_len
        self.bg_color = parse_bg_color(opt.bg_color)

        meta_split = "train" if split == "render" else split
        with open(os.path.join(self.data_dir, self.scan,
                               f"transforms_{meta_split}.json")) as f:
            self.meta = json.load(f)
        with open(os.path.join(self.data_dir, self.scan,
                               "transforms_test.json")) as f:
            self.testmeta = json.load(f)
        skip = max(1, opt.trainskip if meta_split == "train" else opt.testskip)
        self.id_list = list(range(len(self.meta["frames"])))[::skip]
        self.test_id_list = list(range(len(self.testmeta["frames"])))

        # focal from camera_angle_x at native 800px, scaled to img_wh
        # (reference: :381-383)
        focal = 0.5 * 800 / np.tan(0.5 * self.meta["camera_angle_x"])
        self.focal = focal * w / 800.0
        self.near_far = np.array([opt.near_plane, opt.far_plane], np.float32)

        self.intrinsics, self.cam2worlds, self.world2cams = self._build_mats(
            self.meta, self.id_list)

        if split == "render":
            self._build_render_poses()
            self.total = len(self.render_poses)
            return
        self.view_id_list = self._build_init_metas()
        self._read_images()
        self.total = len(self.id_list)

    # ------------------------------------------------------------------ cameras
    def _build_mats(self, meta, id_list):
        intrinsics, c2ws, w2cs = [], [], []
        K = np.array([[self.focal, 0, self.width / 2],
                      [0, self.focal, self.height / 2],
                      [0, 0, 1]], dtype=np.float32)
        for vid in id_list:
            c2w = np.array(meta["frames"][vid]["transform_matrix"],
                           np.float64) @ BLENDER2OPENCV
            c2ws.append(c2w.astype(np.float32))
            w2cs.append(np.linalg.inv(c2w).astype(np.float32))
            intrinsics.append(K.copy())
        return np.stack(intrinsics), np.stack(c2ws), np.stack(w2cs)

    def _build_render_poses(self, stride: int = 20, radius: float = 4.0):
        """reference: get_render_poses (:169-174)."""
        self.render_poses = np.stack(
            [pose_spherical(a, -30.0, radius) @ BLENDER2OPENCV
             for a in np.linspace(-180, 180, stride + 1)[:-1]], 0).astype(np.float32)

    def _build_init_metas(self):
        """reference: build_init_metas (:337-353)."""
        if self.split != "train":
            return []
        cam_xyz = self.cam2worlds[:, :3, 3]
        return hull_view_triplets(cam_xyz, full_comb=self.opt.full_comb > 0)

    # ------------------------------------------------------------------ images
    def _read_images(self):
        """Load RGBA, composite onto bg (reference read_meta :414-447):
        render_gtimgs = rgb*a + (1-a); mvsimgs = rgb*a; alphas; depth masks."""
        from PIL import Image
        self.image_paths, self.render_gtimgs, self.mvsimgs = [], [], []
        self.alphas, self.depths = [], []
        for vid in self.id_list:
            frame = self.meta["frames"][vid]
            path = os.path.join(self.data_dir, self.scan,
                                frame["file_path"] + ".png")
            self.image_paths.append(path)
            img = Image.open(path)
            if img.size != self.img_wh:
                img = img.resize(self.img_wh, Image.Resampling.LANCZOS)
            arr = np.asarray(img, np.float32) / 255.0  # [H,W,4]
            if arr.ndim == 2:
                arr = np.repeat(arr[..., None], 4, axis=-1)
            if arr.shape[-1] == 3:
                arr = np.concatenate([arr, np.ones_like(arr[..., :1])], axis=-1)
            rgb, a = arr[..., :3], arr[..., 3:4]
            self.mvsimgs.append(rgb * a)
            self.render_gtimgs.append(rgb * a + (1.0 - a))
            self.depths.append((a[..., 0] > 0.1).astype(np.float32))
            if self.opt.bg_filtering:
                self.alphas.append(
                    (np.linalg.norm(rgb * a, axis=-1) > 1e-6).astype(np.float32))
            else:
                self.alphas.append(a[..., 0])

    # ------------------------------------------------------------------ items
    def get_init_item(self, idx: int) -> Dict:
        """MVS init bundle for view triplet `idx` (reference: :479-553).

        Arrays are un-batched: images/mvs_images [V,3,H,W], proj_mats
        [V,V,3,4] (proj_mats[i][j] maps ref view i onto src view j at the
        H/4 feature scale), intrinsics [V,3,3], w2cs/c2ws [V,4,4],
        near_fars [V,2], near_fars_depth [2], depths_h/alphas [V,H,W].
        """
        view_ids = self.view_id_list[idx][: self.opt.init_view_num]
        K4 = self.intrinsics[0].copy()
        K4[:2] /= 4.0  # features are at H/4 (reference: :398-400)

        affine, imgs, mvs, depths, alphas = [], [], [], [], []
        intrinsics, w2cs, c2ws, near_fars = [], [], [], []
        for vid in view_ids:
            a = np.eye(4, dtype=np.float64)
            a[:3, :4] = K4 @ self.world2cams[vid][:3, :4]
            affine.append(a)
            imgs.append(np.transpose(self.render_gtimgs[vid], (2, 0, 1)))
            mvs.append(np.transpose(self.mvsimgs[vid], (2, 0, 1)))
            depths.append(self.depths[vid])
            alphas.append(self.alphas[vid])
            intrinsics.append(self.intrinsics[vid])
            w2cs.append(self.world2cams[vid])
            c2ws.append(self.cam2worlds[vid])
            near_fars.append(self.near_far)

        V = len(view_ids)
        proj_mats = np.stack([
            np.stack([np.eye(4) if i == j else affine[j] @ np.linalg.inv(affine[i])
                      for j in range(V)])[:, :3]
            for i in range(V)])
        return {
            "images": np.stack(imgs).astype(np.float32),
            "mvs_images": np.stack(mvs).astype(np.float32),
            "depths_h": np.stack(depths).astype(np.float32),
            "alphas": np.stack(alphas).astype(np.float32),
            "w2cs": np.stack(w2cs).astype(np.float32),
            "c2ws": np.stack(c2ws).astype(np.float32),
            "near_fars_depth": np.asarray(near_fars[0], np.float32),
            "near_fars": np.stack(near_fars).astype(np.float32),
            "proj_mats": proj_mats.astype(np.float32),
            "intrinsics": np.stack(intrinsics).astype(np.float32),
            "view_ids": np.asarray(view_ids),
        }

    def get_dummyrot_item(self, idx: int,
                          rng: Optional[np.random.RandomState] = None) -> Dict:
        """Render-path item without GT (reference: :662-743)."""
        rng = rng or np.random.RandomState()
        pose = self.render_poses[idx]
        return self.make_item(None, self.intrinsics[0], pose,
                              self.opt.near_plane, self.opt.far_plane, rng, idx,
                              full_img=True)

    def load_init_points(self) -> np.ndarray:
        """COLMAP dense points (reference: :356-373)."""
        path = os.path.join(self.data_dir, self.scan,
                            "colmap_results/dense/fused.ply")
        xyz, _ = read_ply_points(path)
        return xyz

    def get_campos_ray(self):
        """Per-train-view camera centers + center-pixel view dirs
        (reference: :320-334); used for nearest-view embedding assignment."""
        from ..ops.camera import get_dtu_raydir
        center = np.asarray(self.img_wh, np.float32)[None] // 2
        pos, dirs = [], []
        for i in range(len(self.id_list)):
            c2w = self.cam2worlds[i]
            pos.append(c2w[:3, 3])
            dirs.append(np.asarray(get_dtu_raydir(
                center, self.intrinsics[0], c2w[:3, :3], True))[0])
        return np.stack(pos), np.stack(dirs)
