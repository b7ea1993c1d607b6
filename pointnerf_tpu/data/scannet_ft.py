"""ScanNet indoor dataset.

Reference: data/scannet_ft_dataset.py — exported/{color,pose,intrinsic,depth}
layout, pose-validity filtering (:315-321), blur-list removal (:277-291),
NSVF/NPBG train-test splits (:294-313), mesh→pcd init points (:375-410),
sensor-depth backprojected init points (:420-451).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from . import register_dataset
from .base import BaseDataset, parse_bg_color


@register_dataset("scannet_ft")
class ScannetFtDataset(BaseDataset):

    def initialize(self, opt, split: str = "train", max_len: int = -1):
        self.opt = opt
        self.data_dir = opt.data_root
        self.scan = opt.scan
        self.split = split
        self.img_wh = (int(opt.img_wh[0]), int(opt.img_wh[1]))
        self.width, self.height = self.img_wh
        self.max_len = max_len
        self.bg_color = parse_bg_color(opt.bg_color)
        scene = os.path.join(self.data_dir, self.scan, "exported")
        self.exported = scene

        K = np.loadtxt(os.path.join(scene, "intrinsic",
                                    "intrinsic_color.txt")).astype(np.float32)
        self.base_intrinsic = K[:3, :3]
        dpath = os.path.join(scene, "intrinsic", "intrinsic_depth.txt")
        self.depth_intrinsic = (np.loadtxt(dpath).astype(np.float32)[:3, :3]
                                if os.path.exists(dpath) else self.base_intrinsic)

        colordir = os.path.join(scene, "color")
        n_imgs = len([f for f in os.listdir(colordir)
                      if os.path.isfile(os.path.join(colordir, f))])
        self.all_id_list = self._filter_valid_id(list(range(n_imgs)))

        # split (reference: :300-313)
        if len(self.all_id_list) > 2900:  # neural point-based graphics config
            self.test_id_list = self.all_id_list[::100]
            self.train_id_list = [
                self.all_id_list[i] for i in range(len(self.all_id_list))
                if ((i % 100) > 19) and
                ((i % 100) < 81 or (i // 100 + 1) * 100 >= len(self.all_id_list))]
        else:  # nsvf config
            step = 5
            self.train_id_list = self.all_id_list[::step]
            self.test_id_list = [self.all_id_list[i]
                                 for i in range(len(self.all_id_list))
                                 if (i % step) != 0] \
                if opt.test_num_step != 1 else self.all_id_list
        self.train_id_list = self._remove_blurry(self.train_id_list)
        # render split = the full valid camera trajectory (reference renders
        # long ScanNet trajectories through the test machinery)
        self.id_list = {"train": self.train_id_list,
                        "render": self.all_id_list}.get(split,
                                                        self.test_id_list)
        self.view_id_list = []

        self.cam2worlds = np.stack([self._load_pose(i) for i in self.id_list]) \
            if self.id_list else np.zeros((0, 4, 4), np.float32)
        self.world2cams = np.stack([np.linalg.inv(c) for c in self.cam2worlds]) \
            if len(self.cam2worlds) else self.cam2worlds
        self.intrinsics = np.tile(self._scaled_intrinsic()[None],
                                  (max(1, len(self.id_list)), 1, 1))
        self.near_far = np.array([opt.near_plane, opt.far_plane], np.float32)
        self._read_images()
        self.total = len(self.id_list)

    # ------------------------------------------------------------------ helpers
    def _scaled_intrinsic(self) -> np.ndarray:
        """Scale the color intrinsic to img_wh (sensor color is 1296x968)."""
        K = self.base_intrinsic.copy()
        # assume recorded intrinsic matches the stored color resolution; infer
        # from the first image on read. Updated in _read_images if needed.
        return K

    def _load_pose(self, idx: int) -> np.ndarray:
        return np.loadtxt(os.path.join(
            self.exported, "pose", f"{idx}.txt")).astype(np.float32).reshape(4, 4)

    def _filter_valid_id(self, ids: List[int]) -> List[int]:
        """Drop frames with invalid (inf/huge) poses (reference: :315-321)."""
        out = []
        for i in ids:
            path = os.path.join(self.exported, "pose", f"{i}.txt")
            if not os.path.exists(path):
                continue
            c2w = np.loadtxt(path).astype(np.float32)
            if np.isfinite(c2w).all() and np.max(np.abs(c2w)) < 30:
                out.append(i)
        return out

    def _remove_blurry(self, ids: List[int]) -> List[int]:
        """Drop ids listed in exported/blur_list.txt (reference: :277-291)."""
        path = os.path.join(self.exported, "blur_list.txt")
        if not os.path.exists(path):
            return ids
        with open(path) as f:
            blur = {int(line.strip()) for line in f if line.strip()}
        return [i for i in ids if i not in blur]

    @staticmethod
    def variance_of_laplacian(gray: np.ndarray) -> float:
        """Blur score (reference: :260-263)."""
        import cv2
        return float(cv2.Laplacian(gray, cv2.CV_64F).var())

    def detect_blurry(self, ids: List[int], worst: int = 150) -> List[int]:
        """Rank frames by Laplacian variance; return the `worst` blurriest
        (reference: :265-276) — used to author blur_list.txt."""
        import cv2
        scores = []
        for i in ids:
            img = cv2.imread(os.path.join(self.exported, "color", f"{i}.jpg"))
            gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
            scores.append(self.variance_of_laplacian(gray))
        order = np.argsort(np.asarray(scores))[:worst]
        return [ids[i] for i in order]

    def _read_images(self):
        from PIL import Image
        self.render_gtimgs, self.alphas, self.depths = [], [], []
        first = True
        for i in self.id_list:
            img = Image.open(os.path.join(self.exported, "color", f"{i}.jpg"))
            if first:
                sw, sh = img.size
                K = self.base_intrinsic.copy()
                K[0] *= self.img_wh[0] / sw
                K[1] *= self.img_wh[1] / sh
                self.intrinsics = np.tile(K[None], (len(self.id_list), 1, 1))
                first = False
            if img.size != self.img_wh:
                img = img.resize(self.img_wh, Image.Resampling.LANCZOS)
            arr = np.asarray(img, np.float32)[..., :3] / 255.0
            self.render_gtimgs.append(arr)
            self.alphas.append(np.ones(arr.shape[:2], np.float32))
            if self.opt.depth_loss_items:
                # real sensor depth for supervision: uint16 mm png at depth-
                # camera resolution, nearest-resized to the color wh. This is
                # camera-space z in meters — the renderer's coarse_depth
                # convention (reference supervises ray-march t instead;
                # z-depth matches the sensor's native parametrization).
                import cv2
                d = self.read_depth(
                    os.path.join(self.exported, "depth", f"{i}.png"))
                self.depths.append(cv2.resize(
                    d, self.img_wh, interpolation=cv2.INTER_NEAREST))
            else:
                self.depths.append(np.ones(arr.shape[:2], np.float32))
        self.has_metric_depth = bool(self.opt.depth_loss_items)

    # ------------------------------------------------------------------ points
    def read_depth(self, path: str) -> np.ndarray:
        """uint16 mm png -> meters, clipped to [0.3, 8] (reference: :412-417)."""
        import cv2
        d = cv2.imread(path, -1).astype(np.float32) / 1000.0
        d[(d > 8.0) | (d < 0.3)] = 0.0
        return d

    def load_init_points(self) -> np.ndarray:
        """Scene mesh/pcd vertices (reference: :394-410)."""
        from .ply import read_ply_points
        for cand in (os.path.join(self.exported, "pcd.ply"),
                     os.path.join(self.data_dir, self.scan,
                                  self.scan + "_vh_clean.ply")):
            if os.path.exists(cand):
                xyz, _ = read_ply_points(cand)
                break
        else:
            raise FileNotFoundError("no pcd.ply / _vh_clean.ply found")
        if self.opt.ranges[0] > -99.0:
            r = np.asarray(self.opt.ranges, np.float32)
            keep = np.all((xyz >= r[:3]) & (xyz <= r[3:]), axis=-1)
            xyz = xyz[keep]
        return xyz

    def load_init_depth_points(self, vox_res: int = 0) -> np.ndarray:
        """Backproject sensor depth maps to world points (reference: :420-451)."""
        from ..run.common import construct_vox_points_xyz
        inv_K = np.linalg.inv(self.depth_intrinsic)
        pieces = []
        for i in self.all_id_list:
            dpath = os.path.join(self.exported, "depth", f"{i}.png")
            if not os.path.exists(dpath):
                continue
            depth = self.read_depth(dpath)
            H, W = depth.shape
            py, px = np.mgrid[0:H, 0:W].astype(np.float32)
            cam = np.stack([px * depth, py * depth, depth], -1) @ inv_K.T
            cam = cam[depth > 0]
            c2w = self._load_pose(i)
            world = cam @ c2w[:3, :3].T + c2w[:3, 3]
            if vox_res > 0:
                # per-frame centroid downsample (reference
                # scannet_ft_dataset.py:444 uses construct_vox_points_xyz)
                world = construct_vox_points_xyz(world, vox_res)
            pieces.append(world.astype(np.float32))
        xyz = np.concatenate(pieces, axis=0) if pieces else \
            np.zeros((0, 3), np.float32)
        if self.opt.ranges[0] > -99.0:
            r = np.asarray(self.opt.ranges, np.float32)
            xyz = xyz[np.all((xyz >= r[:3]) & (xyz <= r[3:]), axis=-1)]
        return xyz

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

    def get_dummyrot_item(self, idx: int, rng=None) -> Dict:
        """Render-split item along the recorded trajectory (no GT needed)."""
        rng = rng or np.random.RandomState()
        return self.make_item(None, self.intrinsics[min(idx, len(self.intrinsics) - 1)],
                              self.cam2worlds[idx], self.opt.near_plane,
                              self.opt.far_plane, rng, idx, full_img=True)
