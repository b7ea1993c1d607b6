"""DTU multi-view dataset for generalizable training / feed-forward inference.

Reference: data/dtu_dataset.py — pair-file metas (scan, light, ref, srcs)
(:190-213), MVSNet cam files (:240-254 — extrinsic rows 1-4, intrinsic rows
7-9 at 1/4 scale, depth min/interval row 11), 1/200 world scale, PFM depths
(:269-280), per-item MVS bundle + target-view rays (:299-488).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from . import register_dataset
from .base import BaseDataset, parse_bg_color
from .pfm import read_pfm


@register_dataset("dtu")
class DtuDataset(BaseDataset):

    def initialize(self, opt, split: str = "train", max_len: int = -1,
                   n_views: int = 3):
        self.opt = opt
        self.data_dir = opt.data_root
        self.split = split
        self.n_views = n_views
        self.max_len = max_len
        self.scale_factor = 1.0 / 200
        self.img_wh = (int(opt.img_wh[0]), int(opt.img_wh[1]))
        self.width, self.height = self.img_wh
        assert self.img_wh[0] % 32 == 0 and self.img_wh[1] % 32 == 0, \
            "img_wh must be multiples of 32 (MVSNet U-Net constraint)"
        self.bg_color = parse_bg_color(opt.bg_color)
        self.near_far = np.asarray([2.125, 4.525], np.float32)
        self._rng = np.random.RandomState(opt.seed)

        self._build_metas()
        self._build_proj_mats()
        self.total = len(self.metas) if max_len <= 0 else max_len

    # ------------------------------------------------------------------ metas
    def _build_metas(self):
        """reference :190-213. Config files live in data_root/dtu_configs."""
        cfg = os.path.join(self.data_dir, "dtu_configs")
        list_path = os.path.join(cfg, "lists", f"dtu_{self.split}_all.txt")
        with open(list_path) as f:
            self.scans = [line.rstrip() for line in f if line.strip()]
        light_idxs = range(7) if self.split == "train" else [3]

        self.metas, id_list = [], []
        pair_path = os.path.join(cfg, "dtu_pairs.txt")
        with open(pair_path) as f:
            lines = [line.rstrip() for line in f]
        num_viewpoint = int(lines[0])
        pairs = []
        for i in range(num_viewpoint):
            ref = int(lines[1 + 2 * i])
            srcs = [int(x) for x in lines[2 + 2 * i].split()[1::2]]
            pairs.append((ref, srcs))
        for scan in self.scans:
            for ref, srcs in pairs:
                for light in light_idxs:
                    self.metas.append((scan, light, ref, srcs))
                    id_list.append([ref] + srcs)
        self.id_list = np.unique(np.asarray(id_list))
        self.remap = np.zeros(self.id_list.max() + 1, dtype=np.int64)
        for i, v in enumerate(self.id_list):
            self.remap[v] = i

    def read_cam_file(self, path: str):
        """MVSNet cam txt (reference :240-254)."""
        with open(path) as f:
            lines = [line.rstrip() for line in f.readlines()]
        extrinsic = np.fromstring(" ".join(lines[1:5]), dtype=np.float32,
                                  sep=" ").reshape(4, 4)
        intrinsic = np.fromstring(" ".join(lines[7:10]), dtype=np.float32,
                                  sep=" ").reshape(3, 3)
        depth_min = float(lines[11].split()[0]) * self.scale_factor
        depth_interval = float(lines[11].split()[1])
        depth_max = depth_min + depth_interval * 192 * self.scale_factor * 1.06
        return intrinsic, extrinsic, [depth_min, depth_max]

    def _build_proj_mats(self):
        """reference :215-237: cam intrinsics are stored at 1/4 scale."""
        affines, intrinsics, w2cs, c2ws, nearfars = [], [], [], [], []
        for vid in self.id_list:
            path = os.path.join(self.data_dir, f"Cameras/train/{vid:08d}_cam.txt")
            intrinsic, extrinsic, near_far = self.read_cam_file(path)
            intrinsic = intrinsic.copy()
            intrinsic[:2] *= 4
            extrinsic = extrinsic.copy()
            extrinsic[:3, 3] *= self.scale_factor
            intrinsics.append(intrinsic.copy())
            a = np.eye(4)
            k4 = intrinsic.copy()
            k4[:2] /= 4
            a[:3, :4] = k4 @ extrinsic[:3, :4]
            affines.append((a, near_far))
            w2cs.append(extrinsic)
            c2ws.append(np.linalg.inv(extrinsic))
        self.affines = affines
        self.intrinsics = np.stack(intrinsics)
        self.world2cams = np.stack(w2cs)
        self.cam2worlds = np.stack(c2ws)

    def read_depth(self, path: str):
        """PFM -> (depth_h at img_wh, mask) (reference :269-280)."""
        import cv2
        depth = np.asarray(read_pfm(path)[0], np.float32)
        depth = cv2.resize(depth, None, fx=0.5, fy=0.5,
                           interpolation=cv2.INTER_NEAREST)
        depth = depth[44:556, 80:720]
        if depth.shape[::-1] != self.img_wh:
            depth = cv2.resize(depth, self.img_wh,
                               interpolation=cv2.INTER_NEAREST)
        return depth * self.scale_factor

    # ------------------------------------------------------------------ items
    def get_init_item(self, idx: int) -> Dict:
        """MVS bundle: src views + target (reference __getitem__ :299-390)."""
        from PIL import Image
        scan, light, target, srcs = self.metas[idx]
        if self.split == "train":
            picks = self._rng.permutation(min(5, len(srcs)))[: self.n_views]
            view_ids = [srcs[i] for i in picks] + [target]
        else:
            view_ids = srcs[: self.n_views] + [target]

        imgs, depths_h, affs, intr, w2cs, c2ws, nfs = [], [], [], [], [], [], []
        for vid in view_ids:
            img_path = os.path.join(
                self.data_dir,
                f"Rectified/{scan}_train/rect_{vid + 1:03d}_{light}_r5000.png")
            img = Image.open(img_path).convert("RGB")
            if img.size != self.img_wh:
                img = img.resize(self.img_wh, Image.Resampling.BILINEAR)
            imgs.append(np.transpose(
                np.asarray(img, np.float32) / 255.0, (2, 0, 1)))
            dpath = os.path.join(self.data_dir,
                                 f"Depths_raw/{scan}/depth_map_{vid:04d}.pfm")
            depths_h.append(self.read_depth(dpath) if os.path.exists(dpath)
                            else np.zeros(self.img_wh[::-1], np.float32))
            ri = self.remap[vid]
            a, nf = self.affines[ri]
            affs.append(a)
            intr.append(self.intrinsics[ri])
            w2cs.append(self.world2cams[ri])
            c2ws.append(self.cam2worlds[ri])
            nfs.append(nf)

        V = len(view_ids)
        inv = [np.linalg.inv(a) for a in affs]
        proj_mats = np.stack([
            np.stack([np.eye(4) if i == j else affs[j] @ inv[i]
                      for j in range(V)])[:, :3] for i in range(V)])
        return {
            "images": np.stack(imgs).astype(np.float32),
            "mvs_images": np.stack(imgs).astype(np.float32),
            "depths_h": np.stack(depths_h).astype(np.float32),
            "w2cs": np.stack(w2cs).astype(np.float32),
            "c2ws": np.stack(c2ws).astype(np.float32),
            "near_fars_depth": np.asarray(nfs[0], np.float32),
            "near_fars": np.tile(self.near_far[None], (V, 1)),
            "proj_mats": proj_mats.astype(np.float32),
            "intrinsics": np.stack(intr).astype(np.float32),
            "view_ids": np.asarray(view_ids),
            "scan": scan,
        }

    def get_item(self, idx: int, rng: Optional[np.random.RandomState] = None,
                 full_img: bool = False) -> Dict:
        """MVS bundle + target-view ray item. Rendering stays in WORLD frame
        (the reference re-bases on the ref camera, :398-405 — equivalent up to
        a rigid transform since the generated points use the same frame)."""
        rng = rng or self._rng
        sample = self.get_init_item(idx)
        trgt = self.opt.trgt_id  # ete scripts: 3 = the held-out 4th view
        gt = np.transpose(sample["images"][trgt], (1, 2, 0))
        c2w = sample["c2ws"][trgt]
        nf = sample["near_fars_depth"]
        item = self.make_item(gt, sample["intrinsics"][trgt], c2w,
                              nf[0], nf[1], rng, idx, full_img=full_img)
        item["mvs_sample"] = sample
        return item

    def __len__(self):
        return self.total
