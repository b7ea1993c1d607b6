"""Perspective-frustum querier (the reference's wcoord_query==0 default path).

Reference: models/neural_points/query_point_indices.py — get_hyperparameters
(:49-76, frustum ranges from the intrinsics), pycuda kernels get_occ_vox /
near_vox_full / insert_vox_points / query_neigh_along_ray_layered (:265-560)
over a per-frame PERSPECTIVE-space voxel grid, shpnt_jitter z-jitter
(:104-116) and pers2w (:93-101).

TPU-native design: in perspective coordinates (x/z, y/z, z) every pixel ray is
an axis-aligned line at constant (x/z, y/z), so the reference's four bespoke
kernels collapse onto the SAME sort-based grid builder and masked static-shape
query used by the world-coordinate path (ops/grid.py, ops/query.py) — just
with a frustum GridSpec: ranges from the intrinsics, vdim = (W, H,
z_depth_dim) / vscale, and the perspective neighbor metric (xy radius cap +
z depth cap, `pers_metric`). The grid is rebuilt per camera; the reference
does the same on every query_points call (:92-94).

Deltas by design:
* `max_o` caps TOTAL occupied voxels of the frustum grid (flat deterministic
  builder) — the reference caps occupied z-voxels per pixel column.
* K nearest by perspective distance replaces the reference's shell-order
  buffer; candidates obey the same xy/z caps.
* inverse (1/z) depth bucketing (`--inverse 1`) buckets the z axis in
  DISPARITY (GridSpec.inv_z): near-camera depth gets proportionally more
  voxels, like the reference's `coor_z = (1/z - 1/far)/vsize` mapping
  (query_point_indices.py get_hyperparameters + kernels). Payload coords
  and neighbor distances stay true-z. shpnt_jitter magnitudes derive from
  the disparity-unit vsize[2] in this mode (train-time only; no shipped
  dev_script trains with --inverse 1).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .camera import w2pers, pers2w
from .grid import GridSpec, build_grid
from .query import (mask_raypos, select_shading_points, knn_neighbors,
                    knn_neighbors_superset, compact_row_map,
                    scatter_row_valid)

SENTINEL = 1.0e6


def make_frustum_spec(opt, intrinsic: np.ndarray, w: int, h: int,
                      near: float, far: float) -> GridSpec:
    """Frustum grid geometry (reference get_hyperparameters :49-76).

    Perspective ranges from the principal point / focal lengths; vdim is the
    image resolution x z_depth_dim, downscaled by opt.vscale.
    """
    K = np.asarray(intrinsic, np.float64)
    x_rl, x_rh = -K[0, 2] / K[0, 0], (w - K[0, 2]) / K[0, 0]
    y_rl, y_rh = -K[1, 2] / K[1, 1], (h - K[1, 2]) / K[1, 1]
    inv = opt.inverse > 0
    # inverse mode: z buckets in disparity — ranges [1/far, 1/near] ascending
    z_lo, z_hi = (1.0 / far, 1.0 / near) if inv else (near, far)
    ranges = np.array([x_rl, y_rl, z_lo, x_rh, y_rh, z_hi], np.float64)
    vdim = np.array([w, h, opt.z_depth_dim], np.int64)
    vsize = (ranges[3:] - ranges[:3]) / vdim
    vscale = np.asarray(opt.vscale, np.float64)
    scaled_vdim = np.ceil(vdim / vscale).astype(np.int64)
    scaled_vsize = vsize * vscale
    max_o = opt.max_o if (opt.max_o or 0) > 0 else int(np.prod(scaled_vdim))
    return GridSpec(
        ranges_min=tuple(float(v) for v in ranges[:3]),
        scaled_vsize=tuple(float(v) for v in scaled_vsize),
        vdim=tuple(int(v) for v in scaled_vdim),
        max_o=int(max_o),
        P=int(opt.P),
        kernel_size=tuple(int(k) for k in opt.kernel_size),
        query_size=tuple(int(q) for q in opt.effective_query_size),
        radius_limit=float(opt.radius_limit_scale * max(vsize[0], vsize[1])),
        vsize=tuple(float(v) for v in vsize),
        # center-distance voxel culling compares disparity-space centers to
        # true-z samples — meaningless under inv_z, so forced off there
        query_max_voxels=0 if inv else int(getattr(opt, "query_max_voxels", 0)),
        # superset rows amortize on the SERVING path, where render_image
        # prebuilds the grid once per camera and reuses it across all ray
        # chunks (~140 at 640x512/48²); per-chunk rebuilds (training) leave
        # this off — the one-time superset build wouldn't amortize. Off under
        # inv_z for the same center-space reason as query_max_voxels.
        superset_P=0 if inv else int(getattr(opt, "frustum_superset_P", 0)),
        # most frustum shading samples sit in empty-but-dilated voxels (rays
        # march in z through the dilation shell around surfaces) and ADOPT a
        # neighbor's window; padding the superset source window by the z
        # adoption radius keeps their candidate sets complete (measured:
        # recall 0.82 -> see BASELINE.md frustum superset section)
        superset_pad=(0, 0, opt.effective_query_size[2] // 2),
        depth_limit=float(opt.depth_limit_scale * vsize[2]),
        pers_metric=True,
        inv_z=inv,
    )


def pers_points(xyz_w: jnp.ndarray, camrotc2w: jnp.ndarray,
                campos: jnp.ndarray) -> jnp.ndarray:
    """[N,3] world points → (x/z, y/z, z) in ONE camera's frame.

    Points at or behind the camera plane (z <= 0) are parked at SENTINEL so
    the grid builder drops them (their x/z, y/z would alias into the frustum).
    """
    p = w2pers(xyz_w[None], camrotc2w[None], campos[None])[0]
    behind = p[..., 2] <= 1e-9
    return jnp.where(behind[..., None], SENTINEL, p)


@functools.partial(jax.jit, static_argnames=("spec",))
def build_frustum_grid(xyz_w: jnp.ndarray, point_mask: jnp.ndarray,
                       camrotc2w: jnp.ndarray, campos: jnp.ndarray,
                       spec: GridSpec):
    """Per-camera perspective grid (reference rebuilds per query, :92-94)."""
    xyz_pers = pers_points(xyz_w, camrotc2w, campos)
    return build_grid(xyz_pers, point_mask, spec), xyz_pers


def _jitter_z(sample_loc: jnp.ndarray, mode: str, vsize_z: float,
              key) -> jnp.ndarray:
    """shpnt_jitter: train-time z perturbation of the shading locations in
    perspective space (reference :104-116; uses the UNSCALED voxel size)."""
    if mode == "passfunc" or key is None:
        return sample_loc
    shape = sample_loc.shape[:-1]
    if mode == "gaussian":
        j = jax.random.normal(key, shape) * (vsize_z / 4.0)
        j = jnp.clip(j, -vsize_z / 2.0, vsize_z / 2.0)
    elif mode == "uniform":
        j = (jax.random.uniform(key, shape) - 0.5) * vsize_z
    else:
        raise ValueError(f"unknown shpnt_jitter {mode}")
    return sample_loc.at[..., 2].add(j)


@functools.partial(jax.jit,
                   static_argnames=("spec", "SR", "K", "jitter", "is_train",
                                    "Nc", "rand_mode"))
def query_frustum_points(raydir: jnp.ndarray, camrotc2w: jnp.ndarray,
                         campos: jnp.ndarray, xyz_pers: jnp.ndarray, grid,
                         spec: GridSpec, SR: int, K: int,
                         jitter: str = "passfunc",
                         key: Optional[jax.Array] = None,
                         is_train: bool = False, Nc: int = 0,
                         rand_mode: bool = False):
    """Full frustum query (reference query_points :80-101).

    raydir [B,R,3] world ray dirs, camrotc2w [B,3,3], campos [B,3]; xyz_pers +
    grid from build_frustum_grid (B must be 1 — one grid per camera, like the
    reference's per-frame hyperparameters).
    Returns (sample_pidx [B,R,SR,K], sample_loc_w [B,R,SR,3],
    sample_ray_dirs [B,R,SR,3], ray_mask [B,R], q_overflow, comp).

    rand_mode (the reference's NN<=0 `query_rand_along_ray` sub-mode,
    query_point_indices.py:414-491): neighbors are K uniform-without-
    replacement samples from the cap-valid kernel-window candidates instead
    of the K nearest. Uses the exact tile scan (no superset rows, no voxel
    cull — both would bias the uniform pick); priorities derive from `key`
    (deterministic; falls back to a fixed key at eval).

    Nc > 0 (pre-KNN SR_budget compaction, round 4 — BASELINE.md named it
    "the known next lever" for dtu_inf serving): the exact 27-tile KNN runs
    only on the first Nc occupancy-valid shading rows instead of all
    B·R·SR — on real DTU scenes most rows are empty. sample_pidx is then
    None and comp = (comp_src, comp_valid, c_pidx, row_valid, counts), the same
    contract as query_grid_points; overflowed rows are counted in
    q_overflow so render_image's budget ladder can retry uncompacted.
    """
    B, R, _ = raydir.shape
    if B != 1 or camrotc2w.shape[0] != 1 or campos.shape[0] != 1:
        raise ValueError(
            f"query_frustum_points requires B == 1 (one perspective grid per "
            f"camera, like the reference's per-frame hyperparameters); got "
            f"raydir batch {B}, camrotc2w batch {camrotc2w.shape[0]}, campos "
            f"batch {campos.shape[0]}. Loop cameras and rebuild the grid.")
    D = spec.vdim[2]

    # pixel ray → fixed perspective column (x/z, y/z): the cam-frame direction
    # scaled to unit z. No pixel indices needed — any world raydir works.
    rot_t = jnp.swapaxes(camrotc2w, -1, -2)                  # w2c rotation
    dir_cam = jnp.einsum("bij,brj->bri", rot_t, raydir)      # [B,R,3]
    fwd = dir_cam[..., 2]
    safe_z = jnp.where(jnp.abs(fwd) > 1e-9, fwd, 1.0)
    xp = dir_cam[..., 0] / safe_z
    yp = dir_cam[..., 1] / safe_z

    # candidate shading positions = the D scaled z-voxel centers of the
    # column. inv_z: centers are uniform in DISPARITY; walk them in
    # descending-disparity order so true z ascends along the ray (the ray
    # march and the first-SR selection expect near-to-far ordering).
    mn = jnp.asarray(spec.ranges_min, jnp.float32)
    svs = jnp.asarray(spec.scaled_vsize, jnp.float32)
    if spec.inv_z:
        disp = mn[2] + (jnp.arange(D - 1, -1, -1, dtype=jnp.float32)
                        + 0.5) * svs[2]
        zc = 1.0 / disp                                              # [D]
    else:
        zc = mn[2] + (jnp.arange(D, dtype=jnp.float32) + 0.5) * svs[2]
    raypos = jnp.stack([
        jnp.broadcast_to(xp[..., None], (B, R, D)),
        jnp.broadcast_to(yp[..., None], (B, R, D)),
        jnp.broadcast_to(zc, (B, R, D))], axis=-1)           # [B,R,D,3]

    rp_valid = mask_raypos(raypos, grid, spec) & (fwd > 1e-9)[..., None]
    sample_loc, sample_mask = select_shading_points(raypos, rp_valid, SR)

    def knn(loc, mask):
        # KNN runs on the UNJITTERED locations; the jitter perturbs only the
        # returned shading positions — reference ordering
        # (query_grid_point_index then shpnt_jitter, :92-99).
        if rand_mode:
            rk = key if key is not None else jax.random.PRNGKey(0)
            return knn_neighbors(loc, mask, xyz_pers, grid, spec, K,
                                 rand_key=jax.random.fold_in(rk, 7))
        if spec.superset_P > 0:
            return knn_neighbors_superset(loc, mask, grid, spec, K)
        return knn_neighbors(loc, mask, xyz_pers, grid, spec, K)

    S = B * R * SR
    q_overflow = jnp.zeros((), jnp.int32)
    comp = None
    if 0 < Nc < S:
        Ncb = -(-Nc // B)
        counts = jnp.sum(sample_mask.astype(jnp.int32), axis=-1)  # [B,R]
        comp_src, comp_valid, n_total = compact_row_map(counts, Ncb, SR)
        c_loc = sample_loc.reshape(S, 3)[comp_src.reshape(-1)].reshape(
            B, Ncb, 3)
        c_pidx = knn(c_loc[:, :, None, :], comp_valid[:, :, None])
        c_pidx = jnp.where(comp_valid[..., None], c_pidx[:, :, 0], -1)
        c_has = comp_valid & jnp.any(c_pidx >= 0, axis=-1)
        row_valid = scatter_row_valid(comp_src, comp_valid, c_has, R, SR)
        ray_mask = jnp.any(row_valid, axis=-1)
        q_overflow = jnp.sum(jnp.maximum(n_total - Ncb, 0))
        comp = (comp_src, comp_valid, c_pidx, row_valid, counts)
        sample_pidx = None
    else:
        sample_pidx = knn(sample_loc, sample_mask)
        ray_mask = jnp.any(
            sample_pidx.reshape(sample_pidx.shape[:2] + (-1,)) >= 0, axis=-1)
    if is_train:
        sample_loc = _jitter_z(sample_loc, jitter, spec.vsize[2], key)

    # perspective → world; per-sample ray dirs (reference pers2w :93-101
    # recomputes dirs from the sample positions, NOT the input raydir)
    sample_loc_w = pers2w(sample_loc, camrotc2w, campos)
    shift = sample_loc_w - campos.reshape(B, 1, 1, 3)
    sample_ray_dirs = shift / (jnp.linalg.norm(shift, axis=-1, keepdims=True)
                               + 1e-7)
    sample_loc_w = jnp.where(sample_mask[..., None], sample_loc_w, 0.0)
    return (sample_pidx, sample_loc_w, sample_ray_dirs, ray_mask, q_overflow,
            comp)
