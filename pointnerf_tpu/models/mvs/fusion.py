"""Multi-view depth fusion: geometric-consistency filtering + visual hull.

Reference: models/mvs/filter_utils.py (gpu path :157-291) and
mvs_utils.alpha_masking (:573-605). Pure jax; runs once per scene at init.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.interp import grid_sample_2d


def reproject_with_depth(depth_ref, K_ref, E_ref, depth_src, K_src, E_src):
    """ref depth map -> src view -> sampled src depth -> back to ref
    (reference: filter_utils.py:157-200). depth_*: [H,W]; K: [3,3]; E: [4,4]
    (w2c). Returns (depth_reprojected, x_reproj, y_reproj, oor_mask)."""
    H, W = depth_ref.shape
    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(x)
    pix = jnp.stack([x.reshape(-1), y.reshape(-1), ones.reshape(-1)])   # [3,HW]

    xyz_ref = jnp.linalg.inv(K_ref) @ (pix * depth_ref.reshape(-1))
    T = E_src @ jnp.linalg.inv(E_ref)
    xyz_src = (T @ jnp.concatenate([xyz_ref, ones.reshape(1, -1)]))[:3]
    Kx = K_src @ xyz_src
    xy_src = Kx[:2] / jnp.maximum(jnp.abs(Kx[2:3]), 1e-9) * jnp.sign(Kx[2:3])

    x_src = xy_src[0].reshape(H, W)
    y_src = xy_src[1].reshape(H, W)
    oor = (x_src >= W) | (x_src < 0) | (y_src >= H) | (y_src < 0)

    grid = jnp.stack([x_src * 2 / (W - 1) - 1, y_src * 2 / (H - 1) - 1], -1)
    sampled = grid_sample_2d(depth_src[None], grid.reshape(-1, 2),
                             align_corners=True, padding_mode="border")[..., 0]

    xyz_src2 = jnp.linalg.inv(K_src) @ (jnp.concatenate(
        [xy_src, ones.reshape(1, -1)]) * sampled.reshape(-1))
    Tb = E_ref @ jnp.linalg.inv(E_src)
    xyz_re = (Tb @ jnp.concatenate([xyz_src2, ones.reshape(1, -1)]))[:3]
    depth_re = xyz_re[2].reshape(H, W)
    Kre = K_ref @ xyz_re
    xy_re = Kre[:2] / jnp.maximum(jnp.abs(Kre[2:3]), 1e-9) * jnp.sign(Kre[2:3])
    return depth_re, xy_re[0].reshape(H, W), xy_re[1].reshape(H, W), oor


def check_geometric_consistency(depth_ref, K_ref, E_ref, depth_src, K_src, E_src):
    """<1px reprojection and <1% relative depth (reference: :204-220).
    Returns (mask, vis_mask, depth_reprojected)."""
    H, W = depth_ref.shape
    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    depth_re, x_re, y_re, oor = reproject_with_depth(
        depth_ref, K_ref, E_ref, depth_src, K_src, E_src)
    dist = jnp.sqrt(jnp.square(x_re - x) + jnp.square(y_re - y))
    rel = jnp.abs(depth_re - depth_ref) / jnp.maximum(depth_ref, 1e-9)
    mask = (dist < 1.0) & (rel < 0.01)
    return mask, ~oor, jnp.where(mask, depth_re, 0.0)


def filter_by_masks(depths: jnp.ndarray, intrinsics: jnp.ndarray,
                    extrinsics: jnp.ndarray, confidences: jnp.ndarray,
                    nearfar_masks: jnp.ndarray, depth_conf_thresh: float,
                    geo_cnsst_num: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-view fused depth + keep mask (reference: filter_by_masks_gpu
    :222-291, manual_depth_view==1 branch).

    depths/conf/nearfar: [V,H,W]; intrinsics [V,3,3]; extrinsics [V,4,4].
    Returns (depth_avg [V,H,W], keep_mask [V,H,W] bool, conf [V,H,W],
    geo_sum [V,H,W] int32 — # of source views agreeing per pixel).
    """
    V = depths.shape[0]

    def per_ref(ref):
        def per_src(src):
            geo, vis, depth_re = check_geometric_consistency(
                depths[ref], intrinsics[ref], extrinsics[ref],
                depths[src], intrinsics[src], extrinsics[src])
            valid = src != ref
            return (geo & valid,
                    jnp.where(valid, depth_re, 0.0))
        geo_masks, depth_res = jax.vmap(per_src)(jnp.arange(V))
        geo_sum = jnp.sum(geo_masks.astype(jnp.int32), axis=0)
        depth_avg = (jnp.sum(depth_res, axis=0) + depths[ref]) / (geo_sum + 1)
        geo_ok = geo_sum >= geo_cnsst_num
        final = (confidences[ref] > depth_conf_thresh) & \
            (nearfar_masks[ref] > 0)
        if V > 1:
            final = final & geo_ok
        return depth_avg, final, geo_sum
    depth_avg, keep, geo_sum = jax.vmap(per_ref)(jnp.arange(V))
    return depth_avg, keep, confidences, geo_sum


def reassign_conf(conf: jnp.ndarray, geo_sum: jnp.ndarray,
                  geo_cnsst_num: int) -> jnp.ndarray:
    """Rescale confidence by multi-view agreement (reference:
    filter_utils.reassign_conf :296-299, enabled by --default_conf > 1.0):
    conf *= 1 - 1.14869^-clip(geo_sum - geo_cnsst_num + 1, 1, 10)
    (1.14869 = 2^(1/5): each extra agreeing view shrinks the residual
    uncertainty by 2 per 5 views)."""
    n = jnp.clip(geo_sum - geo_cnsst_num + 1, 1, 10).astype(jnp.float32)
    return conf * (1.0 - jnp.power(1.14869, -n))


def alpha_masking(points_w: jnp.ndarray, alphas: jnp.ndarray,
                  intrinsics: jnp.ndarray, w2cs: jnp.ndarray,
                  ranges: Optional[np.ndarray] = None) -> jnp.ndarray:
    """Visual-hull keep mask: a world point survives if its projection lands in
    the foreground alpha of EVERY view it is visible in
    (reference: mvs_utils.alpha_masking :573-605).

    points_w: [N,3]; alphas: [V,H,W]; returns bool [N].
    """
    V, H, W = alphas.shape
    ones = jnp.ones((points_w.shape[0], 1), points_w.dtype)
    hom = jnp.concatenate([points_w, ones], axis=-1)          # [N,4]

    def per_view(alpha, K, E):
        cam = (hom @ E.T)[:, :3]
        z = cam[:, 2]
        xy = (cam @ K.T)
        xy = xy[:, :2] / jnp.maximum(jnp.abs(xy[:, 2:3]), 1e-9) \
            * jnp.sign(xy[:, 2:3])
        inb = (z > 1e-4) & (xy[:, 0] >= 0) & (xy[:, 0] <= W - 1) \
            & (xy[:, 1] >= 0) & (xy[:, 1] <= H - 1)
        grid = jnp.stack([xy[:, 0] * 2 / (W - 1) - 1,
                          xy[:, 1] * 2 / (H - 1) - 1], axis=-1)
        a = grid_sample_2d(alpha[None], grid, align_corners=True)[:, 0]
        return jnp.where(inb, (a > 0.1).astype(jnp.int32), 1)
    votes = jax.vmap(per_view)(alphas, intrinsics, w2cs)      # [V,N]
    keep = jnp.all(votes > 0, axis=0)
    if ranges is not None:
        r = jnp.asarray(ranges)
        keep = keep & jnp.all((points_w >= r[:3]) & (points_w <= r[3:]), axis=-1)
    return keep
