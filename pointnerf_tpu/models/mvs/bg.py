"""Plane-background rendering: per-ray background colors from the init views.

Reference:
* ``gen_bg_points`` / ``get_rayplane_cross``  — models/mvs/mvs_utils.py:380-404
* ``set_bg``                                  — models/mvs_points_volumetric_model.py:272-310
* ``homo_warp_fg_mask`` / ``id2mask``         — models/mvs/mvs_utils.py:317-330, 372-377
* driver wiring / ``create_all_bg``           — run/train_ft.py:206-215, 548-576, 788-798

For every camera ray, the intersection with the scene's background plane is
projected into each MVS-init view; pixels there that (a) are not covered by
the foreground point cloud and (b) match the plane color within a threshold
contribute their image color; the per-ray background is the max over views.
These are precomputed once per train/test frame as [H,W,3] maps (the
reference does the same via ``create_all_bg``) and indexed per ray batch.

All of this is host-side preprocessing over a handful of views — plain
numpy + the jittable 2-D sampler; the hot path only consumes ``bg_ray``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ...ops.interp import grid_sample_2d


def get_rayplane_cross(campos: np.ndarray, raydir: np.ndarray, plane_pnt,
                       plane_normal, epsilon: float = 1e-3) -> np.ndarray:
    """Ray/plane intersections in world space (reference mvs_utils.py:387-404).

    campos [B,3], raydir [B,R,3] -> [B,R,3]; rays more parallel than epsilon
    (or pointing away) return zeros, as in the reference.
    """
    p_no = np.asarray(plane_normal, np.float32).reshape(1, 1, 3)
    p_co = np.asarray(plane_pnt, np.float32).reshape(1, 1, 3)
    dot = np.sum(p_no * raydir, axis=-1)                      # [B,R]
    ok = dot >= epsilon
    w = campos[:, None, :] - p_co                             # [B,1,3]
    fac = -np.sum(p_no * w, axis=-1) / np.where(ok, dot, 1.0)  # [B,R]
    cross = campos[:, None, :] + raydir * fac[..., None]
    return np.where(ok[..., None], cross, 0.0).astype(np.float32)


def _project(xyz_w: np.ndarray, w2c: np.ndarray, intrinsic: np.ndarray
             ) -> Tuple[np.ndarray, np.ndarray]:
    """World points -> (pixel xy [N,2], cam z [N])."""
    hom = np.concatenate([xyz_w, np.ones_like(xyz_w[:, :1])], axis=-1)
    cam = (hom @ w2c.T)[:, :3]
    z = cam[:, 2]
    pix = (cam / np.where(np.abs(z[:, None]) > 1e-9, z[:, None], 1e-9)) \
        @ intrinsic.T
    return pix[:, :2], z


def fg_mask_from_points(xyz_w: np.ndarray, w2c: np.ndarray,
                        intrinsic: np.ndarray, H: int, W: int) -> np.ndarray:
    """[H,W] uint8: pixels whose ceil cell any foreground point projects into
    (reference homo_warp_fg_mask + id2mask, mvs_utils.py:317-330, 372-377)."""
    xy, z = _project(xyz_w, w2c, intrinsic)
    hard = np.ceil(xy)
    inb = (xy[:, 0] >= 0) & (hard[:, 0] <= W - 1) & \
        (xy[:, 1] >= 0) & (hard[:, 1] <= H - 1) & (z > 1e-9)
    mask = np.zeros((H, W), np.uint8)
    h = hard[inb].astype(np.int64)
    mask[h[:, 1], h[:, 0]] = 1
    return mask


def set_bg(xyz_sect_plane: np.ndarray, views: Sequence[Dict],
           plane_color, fg_xyz: Optional[np.ndarray] = None,
           fg_masks: Optional[List[np.ndarray]] = None,
           thresh: float = 0.03) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Background color per ray from the init views
    (reference mvs_points_volumetric_model.set_bg :272-310).

    xyz_sect_plane: [R,3] ray/plane crossings (world). views: dicts with
    ``img`` [3,H,W] float, ``w2c`` [4,4], ``intrinsic`` [3,3]. Pixels covered
    by the foreground cloud are excluded; sampled colors outside
    plane_color±thresh are zeroed; the result is the max over views.
    Returns (bg_ray [R,3], fg_masks) — fg_masks computed once and reusable.
    """
    plane_color = np.asarray(plane_color, np.float32)
    R = xyz_sect_plane.shape[0]
    if fg_masks is None:
        assert fg_xyz is not None, "need fg_xyz to build foreground masks"
        fg_masks = []
        for v in views:
            H, W = v["img"].shape[-2:]
            fg_masks.append(fg_mask_from_points(fg_xyz, v["w2c"],
                                                v["intrinsic"], H, W))
    per_view = []
    for v, fg in zip(views, fg_masks):
        H, W = v["img"].shape[-2:]
        xy, z = _project(xyz_sect_plane, v["w2c"], v["intrinsic"])
        hard = np.ceil(xy)
        inb = (xy[:, 0] >= 0) & (hard[:, 0] <= W - 1) & \
            (xy[:, 1] >= 0) & (hard[:, 1] <= H - 1) & (z > 1e-9)
        h = hard.astype(np.int64)
        not_fg = np.zeros(R, bool)
        not_fg[inb] = fg[h[inb, 1], h[inb, 0]] < 1
        keep = inb & not_fg
        grid = np.stack([xy[:, 0] / ((W - 1) / 2.0) - 1.0,
                         xy[:, 1] / ((H - 1) / 2.0) - 1.0], axis=-1)
        col = np.asarray(grid_sample_2d(jnp.asarray(v["img"]),
                                        jnp.asarray(grid.astype(np.float32)),
                                        align_corners=True))
        col = col * keep[:, None].astype(np.float32)
        fit = np.all((col >= plane_color - thresh) &
                     (col <= plane_color + thresh), axis=-1)
        per_view.append(col * fit[:, None])
    bg = np.max(np.stack(per_view, axis=1), axis=1)       # [R,3]
    return bg.astype(np.float32), fg_masks


def collect_bg_views(dataset, init_view_num: int = 3) -> List[Dict]:
    """Reference views of each MVS-init bundle, as set_bg inputs
    (reference gen_points_filter_embeddings collects these, train_ft.py:70-90;
    only images + cameras are needed — no network state)."""
    views = []
    for ti in range(len(dataset.view_id_list)):
        s = dataset.get_init_item(ti)
        views.append({"img": np.asarray(s["images"][0], np.float32),
                      "w2c": np.asarray(s["w2cs"][0], np.float32),
                      "intrinsic": np.asarray(s["intrinsics"][0], np.float32)})
    return views


def create_all_bg(dataset, views: Sequence[Dict], fg_xyz: np.ndarray,
                  plane_params, dummy: bool = False) -> List[np.ndarray]:
    """Precompute per-frame [H,W,3] background maps (reference
    run/train_ft.py:548-576). plane_params: (plane_pnt, plane_normal,
    plane_color); dummy=True walks render poses via get_dummyrot_item."""
    plane_pnt, plane_normal, plane_color = plane_params
    fg_masks = None
    out = []
    for i in range(len(dataset)):
        item = dataset.get_dummyrot_item(i) if dummy else \
            dataset.get_item(i, full_img=True)
        H, W = int(item["h"]), int(item["w"])
        cross = get_rayplane_cross(item["campos"], item["raydir"],
                                   plane_pnt, plane_normal)[0]
        bg, fg_masks = set_bg(cross, views, plane_color, fg_xyz=fg_xyz,
                              fg_masks=fg_masks)
        # items raster rays row-major over the full image (pixel_idx order)
        pix = item["pixel_idx"][0].astype(np.int64)
        img = np.zeros((H, W, 3), np.float32)
        img[pix[:, 1], pix[:, 0]] = bg
        out.append(img)
    return out
