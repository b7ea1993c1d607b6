"""NeRF-Synthetic legacy (non-360) per-scene finetune dataset.

Reference: data/nerf_synth_ft_dataset.py (the one reference module without a
counterpart until round 4). Deltas vs the 360 variant it predates:

* every split reads ``transforms_train.json`` — test/val ids index TRAIN
  frames, selected by an external pairs table (reference :115-117, :295-296);
* init view groups come from a curated pairs FILE
  (``{scan}_finetune_init_pairs_final.txt``, MVSNet list format,
  reference :278-293) instead of BPA triangulation over camera positions;
* per-view near/far is the fixed blender range [2.0, 6.0]
  (reference :305, :497-498) rather than the CLI planes;
* the render path (``get_dummyrot_item``) builds rays with the blender
  focal-based convention (``get_blender_raydir``, reference :643) and derives
  near/far from the camera distance when the CLI planes are unset
  (reference :590-604);
* ``--normview 1`` re-expresses every pose in the first test camera's frame
  (reference :119-126, :236-256).

Config-file locations are resolved under ``data_root`` (the reference
hard-codes ``../data/...`` relative to its checkout):
``{data_root}/nerf_synth_configs/list/{scan}_finetune_init_pairs_final.txt``
and ``{data_root}/dtu_configs/pairs.th`` (torch-saved dict,
``{scan}_{split}`` -> id list). When either file is absent the dataset falls
back to the 360 variant's machinery (all train frames / hull triplets /
testskip), so scenes without the curated lists still load — a documented
usability extension; the reference crashes.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import json

import numpy as np

from . import register_dataset
from .base import BaseDataset
from .nerf_synth360_ft import (NerfSynth360FtDataset, BLENDER2OPENCV,
                               hull_view_triplets)
from ..ops.camera import get_blender_raydir

LEGACY_NEAR_FAR = np.array([2.0, 6.0], np.float32)  # reference :305


def load_pairs_txt(path: str) -> List[List[int]]:
    """MVSNet-style pairs list (reference nerf_synth_ft_dataset.py:278-293):
    header ``num_viewpoint,num_pairs``; then per entry a ref-view line and a
    comma-separated src-view line. Entries past num_viewpoint add extra view
    groups without extending the train id list."""
    groups = []
    with open(path) as f:
        num_lst = f.readline().rstrip().split(",")
        num_viewpoint, num_pairs = int(num_lst[0]), int(num_lst[1])
        for _ in range(max(num_viewpoint, num_pairs)):
            ref_line = f.readline().rstrip()
            if not ref_line:
                break
            ref_view = int(ref_line)
            src_views = [int(x) for x in f.readline().rstrip().split(",")]
            groups.append([ref_view] + src_views)
    return groups, num_viewpoint


@register_dataset("nerf_synth_ft")
class NerfSynthFtDataset(NerfSynth360FtDataset):

    def initialize(self, opt, split: str = "train", max_len: int = -1):
        self.opt = opt
        self.data_dir = opt.data_root
        self.scan = opt.scan
        self.split = split
        w, h = int(opt.img_wh[0]), int(opt.img_wh[1])
        self.img_wh = (w, h)
        self.width, self.height = w, h
        self.max_len = max_len
        from .base import parse_bg_color
        self.bg_color = parse_bg_color(opt.bg_color)

        # every split reads the TRAIN transforms (reference :115-117)
        with open(os.path.join(self.data_dir, self.scan,
                               "transforms_train.json")) as f:
            self.meta = json.load(f)
        self.testmeta = self.meta

        focal = 0.5 * 800 / np.tan(0.5 * self.meta["camera_angle_x"])
        self.focal = focal * w / 800.0
        self.near_far = LEGACY_NEAR_FAR.copy()

        self._build_id_lists()
        norm_w2c = self._norm_w2c() if opt.normview > 0 else None
        self.intrinsics, self.cam2worlds, self.world2cams = self._build_mats(
            self.meta, self.id_list, norm_w2c=norm_w2c)

        if split == "render":
            self._build_render_poses()
            self.total = len(self.render_poses)
            return
        self._read_images()
        self.total = len(self.id_list)

    # ------------------------------------------------------------------ ids
    def _pairs_txt_path(self) -> str:
        return os.path.join(self.data_dir, "nerf_synth_configs", "list",
                            f"{self.scan}_finetune_init_pairs_final.txt")

    def _pairs_th_path(self) -> str:
        return os.path.join(self.data_dir, "dtu_configs", "pairs.th")

    def _build_id_lists(self):
        """id_list + view_id_list per split (reference :274-296)."""
        self.view_id_list = []
        if self.split == "train" or self.split == "render":
            pairs_path = self._pairs_txt_path()
            if os.path.exists(pairs_path):
                groups, num_viewpoint = load_pairs_txt(pairs_path)
                self.id_list = [g[0] for g in groups[:num_viewpoint]]
                # remap frame ids -> positions in id_list (the reference's
                # view_id_dict, :345,:370); src views must be ref views
                pos = {fid: i for i, fid in enumerate(self.id_list)}
                try:
                    self.view_id_list = [[pos[v] for v in g] for g in groups]
                except KeyError as e:
                    raise ValueError(
                        f"pairs file {pairs_path}: src view {e} is not one of "
                        f"the {len(self.id_list)} ref views") from None
            else:
                # fallback: all train frames, hull triplets (360 machinery)
                skip = max(1, self.opt.trainskip)
                self.id_list = list(range(len(self.meta["frames"])))[::skip]
        else:  # test / val ids index TRAIN frames (reference :296)
            th_path = self._pairs_th_path()
            if os.path.exists(th_path):
                import torch
                pairs = torch.load(th_path, weights_only=False)
                self.id_list = [int(i) for i in
                                pairs[f"{self.scan}_{self.split}"]]
            else:
                skip = max(1, self.opt.testskip)
                self.id_list = list(range(len(self.meta["frames"])))[::skip]
        self.test_id_list = self.id_list

    def _norm_w2c(self) -> np.ndarray:
        """--normview: the first test camera's w2c re-expresses every pose
        (reference normalize_cam :236-256 — returns w2cs[0])."""
        th_path = self._pairs_th_path()
        if os.path.exists(th_path):
            import torch
            pairs = torch.load(th_path, weights_only=False)
            first = int(pairs[f"{self.scan}_test"][0])
        else:
            first = 0
        c2w = np.array(self.meta["frames"][first]["transform_matrix"],
                       np.float64) @ BLENDER2OPENCV
        return np.linalg.inv(c2w)

    def _build_mats(self, meta, id_list, norm_w2c: Optional[np.ndarray] = None):
        intrinsics, c2ws, w2cs = [], [], []
        K = np.array([[self.focal, 0, self.width / 2],
                      [0, self.focal, self.height / 2],
                      [0, 0, 1]], dtype=np.float32)
        for vid in id_list:
            c2w = np.array(meta["frames"][vid]["transform_matrix"],
                           np.float64) @ BLENDER2OPENCV
            if norm_w2c is not None:  # reference :309-310
                c2w = norm_w2c @ c2w
            c2ws.append(c2w.astype(np.float32))
            w2cs.append(np.linalg.inv(c2w).astype(np.float32))
            intrinsics.append(K.copy())
        return np.stack(intrinsics), np.stack(c2ws), np.stack(w2cs)

    def _build_init_metas(self):
        # only reached through the parent's code paths; view_id_list is
        # already populated by _build_id_lists when a pairs file exists
        if self.view_id_list:
            return self.view_id_list
        cam_xyz = self.cam2worlds[:, :3, 3]
        return hull_view_triplets(cam_xyz, full_comb=self.opt.full_comb > 0)

    def _read_images(self):
        super()._read_images()
        if not self.view_id_list and self.split == "train":
            self.view_id_list = self._build_init_metas()

    # ------------------------------------------------------------------ items
    def get_item(self, idx: int, rng: Optional[np.random.RandomState] = None,
                 full_img: bool = False) -> Dict:
        """Fixed blender near/far [2, 6] per item (reference :497-498)."""
        rng = rng or np.random.RandomState()
        return self.make_item(self.render_gtimgs[idx], self.intrinsics[idx],
                              self.cam2worlds[idx], float(LEGACY_NEAR_FAR[0]),
                              float(LEGACY_NEAR_FAR[1]), rng, idx,
                              full_img=full_img)

    def get_dummyrot_item(self, idx: int,
                          rng: Optional[np.random.RandomState] = None) -> Dict:
        """Render-path item: blender focal raydir + distance-derived planes
        (reference :575-663)."""
        rng = rng or np.random.RandomState()
        pose = self.render_poses[idx]
        campos = pose[:3, 3]
        dist = float(np.linalg.norm(campos))
        near = self.opt.near_plane if self.opt.near_plane > 0 \
            else max(dist - 1.5, 0.02)
        far = self.opt.far_plane if self.opt.far_plane > 0 else dist + 0.7
        item = self.make_item(None, self.intrinsics[0], pose, near, far,
                              rng, idx, full_img=True)
        raydir = get_blender_raydir(
            item["pixel_idx"].reshape(-1, 2), self.height, self.width,
            self.focal, pose[:3, :3].astype(np.float32),
            self.opt.dir_norm > 0)
        item["raydir"] = np.asarray(raydir, np.float32).reshape(1, -1, 3)
        return item
