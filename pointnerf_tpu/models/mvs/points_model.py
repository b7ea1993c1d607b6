"""MVS point generation + per-point feature embedding.

Reference: models/mvs/mvs_points_model.py — gen_points (depth estimation →
gaussian depth samples → camera-space points, :262-341), filter_by_masks,
query_embedding (reproject points into source views, sample FPN features +
colors + per-view directions + confidence, compress 63→C with a small MLP,
:198-259), forward (:345-383).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.interp import grid_sample_2d, resize_nearest
from ..networks import activation, apply_mlp, init_mlp
from . import fusion
from .mvsnet import init_mvsnet, mvsnet_forward
from .nets import fpn_featurenet, init_fpn_featurenet


# ------------------------------------------------------------------ geometry
def ndc_2_cam(ndc_xyz: jnp.ndarray, near_far, intrinsic: jnp.ndarray,
              W: int, H: int) -> jnp.ndarray:
    """[...,3] ndc (x,y in [0,1] pixel-normalized, z in [0,1] depth-normalized)
    -> camera coords (reference: mvs_utils.ndc_2_cam :92-99)."""
    inv_scale = jnp.asarray([W - 1, H - 1], jnp.float32)
    cam_z = ndc_xyz[..., 2:3] * (near_far[1] - near_far[0]) + near_far[0]
    cam_xy = ndc_xyz[..., :2] * inv_scale * cam_z
    cam_xyz = jnp.concatenate([cam_xy, cam_z], axis=-1)
    return cam_xyz @ jnp.linalg.inv(intrinsic).T


def depth2point(sampled_depth: jnp.ndarray, intrinsic: jnp.ndarray,
                near_far) -> jnp.ndarray:
    """sampled ndc depth [N,H,W] -> cam xyz [N,H,W,3]
    (reference: mvs_points_model.py:170-182)."""
    N, H, W = sampled_depth.shape
    vx = jnp.arange(W, dtype=jnp.float32) / (W - 1)
    vy = jnp.arange(H, dtype=jnp.float32) / (H - 1)
    gy, gx = jnp.meshgrid(vy, vx, indexing="ij")
    ndc = jnp.stack([jnp.broadcast_to(gx, sampled_depth.shape),
                     jnp.broadcast_to(gy, sampled_depth.shape),
                     sampled_depth], axis=-1)
    return ndc_2_cam(ndc, near_far, intrinsic, W, H)


def topk_depth_hypotheses(prob: jnp.ndarray, depth_values: jnp.ndarray,
                          dnum: int, HW: Tuple[int, int]
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k multi-depth extraction (manual_depth_view >= 2): the dnum
    highest-probability depth slices per pixel become depth hypotheses,
    nearest-upsampled to full resolution (reference mvs_points_model.py:
    322-334 — torch.topk over the prob volume + F.interpolate 'nearest').
    prob: [D,h,w] softmaxed; returns (depths [dnum,H,W], conf [dnum,H,W])."""
    conf_k, idx_k = jax.lax.top_k(prob.transpose(1, 2, 0), dnum)  # [h,w,dnum]
    d_k = depth_values[idx_k]
    return (resize_nearest(d_k.transpose(2, 0, 1), HW),
            resize_nearest(conf_k.transpose(2, 0, 1), HW))


def gau_sample_depth(key, cam_depth: jnp.ndarray, std: float, num: int,
                     near_far) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Manual-depth path: normalize depth to ndc, jitter with gaussian std,
    clamp (reference: gau_single_sampler + sample_by_gau :141-168).
    cam_depth [H,W] -> (ndc depth [num,H,W], nearfar mask [H,W])."""
    mask = (cam_depth >= near_far[0]) & (cam_depth <= near_far[1])
    ndc = (cam_depth - near_far[0]) / (near_far[1] - near_far[0])
    if num == 1 and std == 0.0:
        return ndc[None], mask
    noise = jax.random.normal(key, (num,) + cam_depth.shape) * std
    return jnp.clip(ndc[None] + noise, 0.0, 1.0), mask


# ------------------------------------------------------------------ embedding
def homo_warp_nongrid(c2w_ref, w2c_src, intrinsic, cam_xyz, H, W):
    """Project ref-camera points into a src view; normalized grid + in-bounds
    mask (reference: mvs_utils.homo_warp_nongrid :299-316, unfiltered —
    static shapes)."""
    ones = jnp.ones_like(cam_xyz[:, :1])
    if w2c_src is not None:
        hom = jnp.concatenate([cam_xyz, ones], axis=-1)
        src = (hom @ c2w_ref.T @ w2c_src.T)[:, :3]
    else:
        src = cam_xyz
    pix = (src / jnp.maximum(jnp.abs(src[:, 2:3]), 1e-9)
           * jnp.sign(src[:, 2:3])) @ intrinsic.T
    xy = pix[:, :2]
    mask = (xy[:, 0] >= 0) & (xy[:, 0] <= W - 1) & \
        (xy[:, 1] >= 0) & (xy[:, 1] <= H - 1) & (src[:, 2] > 1e-9)
    grid = jnp.stack([xy[:, 0] / ((W - 1) / 2.0) - 1.0,
                      xy[:, 1] / ((H - 1) / 2.0) - 1.0], axis=-1)
    return grid, mask


def homo_warp_nongrid_occ(c2w_ref, w2c_src, intrinsic, cam_xyz, H, W,
                          tolerate: float = 0.1):
    """Occlusion-aware projection with a per-pixel z-buffer.

    Reference: mvs_utils.homo_warp_nongrid_occ (:333-369), which builds the
    z-buffer with torch_scatter.scatter_min on a CPU round-trip; here it is a
    deterministic on-device scatter-min over the W*H pixel cells. A point is
    kept only if its source-camera depth is within `tolerate` of the minimum
    depth projecting into the same (ceil) pixel cell — points seen through an
    occluder are masked out. Static shapes: occluded points are masked, not
    compacted.
    """
    ones = jnp.ones_like(cam_xyz[:, :1])
    if w2c_src is not None:
        hom = jnp.concatenate([cam_xyz, ones], axis=-1)
        src = (hom @ c2w_ref.T @ w2c_src.T)[:, :3]
    else:
        src = cam_xyz
    z = src[:, 2]
    pix = (src / jnp.maximum(jnp.abs(src[:, 2:3]), 1e-9)
           * jnp.sign(src[:, 2:3])) @ intrinsic.T
    xy = pix[:, :2]
    hard = jnp.ceil(xy)
    inb = (xy[:, 0] >= 0) & (hard[:, 0] <= W - 1) & \
        (xy[:, 1] >= 0) & (hard[:, 1] <= H - 1) & (z > 1e-9)
    # cell id = ceil(x)*H + ceil(y), as in the reference (:356)
    cell = (hard[:, 0] * H + hard[:, 1]).astype(jnp.int32)
    cell = jnp.where(inb, cell, W * H)                       # OOB → dropped
    BIG = jnp.float32(3.0e38)
    zbuf = jnp.full((W * H,), BIG, jnp.float32).at[cell].min(
        z.astype(jnp.float32), mode="drop")
    zmin = zbuf[jnp.clip(cell, 0, W * H - 1)]
    mask = inb & (z <= zmin + tolerate)
    grid = jnp.stack([xy[:, 0] / ((W - 1) / 2.0) - 1.0,
                      xy[:, 1] / ((H - 1) / 2.0) - 1.0], axis=-1)
    return grid, mask


def extract_2d(img_feats: Sequence[jnp.ndarray], view_ids, layer_ids,
               intrinsics, c2ws, w2cs, cam_xyz, H, W, cam_vid: int,
               depth_occ: int = 0):
    """Sample per-view 2D feature pyramids at projected point locations
    (reference: extract_2d :198-218; with --depth_occ the projection is
    z-buffer-filtered, reference :203). Returns (feats [N,F], colors [N,3V'])."""
    feats, colors = [], []
    for vid in view_ids:
        w2c = None if vid == cam_vid else w2cs[vid]
        if depth_occ > 0:
            grid, mask = homo_warp_nongrid_occ(
                c2ws[cam_vid], w2c, intrinsics[vid], cam_xyz, H, W)
        else:
            grid, mask = homo_warp_nongrid(c2ws[cam_vid], w2c,
                                           intrinsics[vid], cam_xyz, H, W)
        m = mask[:, None].astype(cam_xyz.dtype)
        for lid in layer_ids:
            feat = img_feats[lid][vid]                 # [C,h,w]
            sampled = grid_sample_2d(feat, grid, align_corners=True) * m
            (colors if lid == 0 else feats).append(sampled)
    feats = jnp.concatenate(feats, axis=-1)
    colors = jnp.concatenate(colors, axis=-1) if colors else None
    return feats, colors


def init_premlp(key, opt) -> List[Dict]:
    """63 -> point_features_dim compressor (reference: premlp_init :22-34)."""
    dims = [63] + [opt.point_features_dim] * opt.shading_feature_mlp_layer0
    return init_mlp(key, dims, opt.act_type)


class MvsPointsParams(dict):
    pass


def init_mvs_points_params(key, opt) -> Dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {"mvsnet": init_mvsnet(k1), "featurenet": init_fpn_featurenet(k2)}
    if opt.shading_feature_mlp_layer0 > 0:
        p["premlp"] = init_premlp(k3, opt)
    if opt.manual_depth_view == -1:
        from .probnet import init_probnet
        p["probnet"] = init_probnet(k4)
    return p


def query_embedding(params: Dict, opt, img_feats, cam_xyz: jnp.ndarray,
                    conf: Optional[jnp.ndarray], intrinsics, c2ws, w2cs,
                    H: int, W: int, cam_vid: int, training: bool = False):
    """Per-point features/colors/dirs/conf (reference: query_embedding
    :225-259). cam_xyz: [N,3] in view cam_vid's camera frame."""
    emb_parts, colors, dirs, pconf = [], None, None, None
    for feat_str in opt.appr_feature_str0:
        if feat_str.startswith("imgfeat"):
            _, vids, lids = feat_str.split("_")
            feats, colors = extract_2d(
                img_feats, [int(a) for a in vids], [int(a) for a in lids],
                intrinsics, c2ws, w2cs, cam_xyz, H, W, cam_vid,
                depth_occ=opt.depth_occ)
            emb_parts.append(feats)
        elif feat_str.startswith("dir"):
            _, vids = feat_str.split("_")
            vids = jnp.asarray([int(a) for a in vids])
            cam_pos_w = c2ws[vids][:, :, 3]                 # [V,4]
            cam_pos_cam = (cam_pos_w @ w2cs[cam_vid].T)[:, :3]
            d = cam_xyz[:, None, :] - cam_pos_cam[None]     # [N,V,3]
            d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-6)
            d = d.reshape(-1, 3) @ c2ws[cam_vid][:3, :3].T
            d = d @ c2ws[opt.ref_vid][:3, :3].T             # ref-cam frame
            dirs = d.reshape(cam_xyz.shape[0], -1)
        elif feat_str.startswith("point_conf"):
            pconf = conf if conf is not None else \
                jnp.ones((cam_xyz.shape[0], 1), cam_xyz.dtype)
    emb = jnp.concatenate(emb_parts, axis=-1)
    if "premlp" in params:
        act = activation(opt.act_type)
        emb = apply_mlp(params["premlp"],
                        jnp.concatenate([emb, colors, dirs, pconf], axis=-1),
                        act, final_act=True)
    return emb, colors, dirs, pconf


def _gen_points_probnet(params: Dict, opt, sample: Dict, key, imgs,
                        depth_vids, near_far, intrinsics, w2cs, c2ws,
                        training: bool) -> Dict[str, jnp.ndarray]:
    """Learned-probability init (manual_depth_view == -1): cost volume →
    ProbNet depth distribution → gaussian point sampling at the padded
    feature grid (reference mvs_points_model.py:282-296; see
    probnet.py for the documented deltas). Cost-volume dims (depth_grid and
    the padded feature grid) must be divisible by 8 for the 3D U-Net."""
    from .probnet import probnet_forward, prob_moments, prob_filter_mass

    V, _, H, W = imgs.shape
    img_feats = fpn_featurenet(params["featurenet"], imgs, training)
    feats = img_feats[-1]                                  # [V,32,h,w]
    h, w = feats.shape[-2:]
    D = opt.depth_grid
    dvals = near_far[0] + (near_far[1] - near_far[0]) * \
        jnp.linspace(0.0, 1.0, D)                          # camera depths
    proj_all = jnp.asarray(sample["proj_mats"])            # [V,V,3,4] (1/4 res)

    out = {"xyz_w": [], "embedding": [], "color": [], "dir": [], "conf": [],
           "keep": []}
    for vid in depth_vids:
        prob = probnet_forward(params["probnet"], imgs, feats,
                               proj_all[vid], dvals, pad=opt.pad, vid=vid,
                               training=training)          # [D,hp,wp]
        e, std = prob_moments(prob)
        mass = prob_filter_mass(prob, e, opt.num_neighbor)
        mask = mass > opt.dprob_thresh
        hp, wp = e.shape

        key, sub = jax.random.split(key)
        N = opt.num_each_depth
        noise = jax.random.normal(sub, (N,) + e.shape)
        sampled = jnp.clip(e[None] + std[None] * noise, 0.0, 1.0)

        # feature-resolution intrinsic, principal point shifted by pad
        scale = h / H
        K = intrinsics[vid]
        K_feat = jnp.asarray(
            [[K[0, 0] * scale, 0.0, K[0, 2] * scale + opt.pad],
             [0.0, K[1, 1] * scale, K[1, 2] * scale + opt.pad],
             [0.0, 0.0, 1.0]], jnp.float32)
        cam_xyz = depth2point(sampled, K_feat, near_far).reshape(-1, 3)

        conf_rows = jnp.tile(mass.reshape(-1, 1), (N, 1))
        keep_rows = jnp.tile(mask.reshape(-1), (N,))
        emb, col, drs, cf = query_embedding(
            params, opt, img_feats, cam_xyz, conf_rows,
            intrinsics, c2ws, w2cs, H, W, vid)
        ones = jnp.ones_like(cam_xyz[:, :1])
        xyz_w = (jnp.concatenate([cam_xyz, ones], -1)
                 @ jnp.linalg.inv(w2cs[vid]).T)[:, :3]
        out["xyz_w"].append(xyz_w)
        out["embedding"].append(emb)
        out["color"].append(col)
        out["dir"].append(drs)
        out["conf"].append(cf)
        out["keep"].append(keep_rows)
    return {k: jnp.concatenate(v, axis=0) for k, v in out.items()}


def gen_points(params: Dict, opt, sample: Dict, key,
               training: bool = False) -> Dict[str, np.ndarray]:
    """Depth estimation + fusion + embedding for one init view bundle
    (reference: gen_points :262-341 + forward :345-383, manual_depth_view 0/1).

    sample: get_init_item output without the batch dim — images/mvs_images
    [V,3,H,W], proj_mats [V,V,3,4], intrinsics [V,3,3], w2cs/c2ws [V,4,4],
    near_fars [V,2], near_fars_depth [2], depths_h [V,H,W] (mode 0).
    Returns dict with xyz_w [N,3], embedding, color, dir, conf, keep mask.
    """
    imgs = jnp.asarray(sample["mvs_images"])
    V, _, H, W = imgs.shape
    depth_vids = [int(v) for v in str(opt.depth_vid)]
    near_far = jnp.asarray(sample["near_fars"][0])
    intrinsics = jnp.asarray(sample["intrinsics"])
    w2cs = jnp.asarray(sample["w2cs"])
    c2ws = jnp.asarray(sample["c2ws"])

    if opt.manual_depth_view == -1:
        return _gen_points_probnet(params, opt, sample, key, imgs, depth_vids,
                                   near_far, intrinsics, w2cs, c2ws, training)

    dnum = opt.manual_depth_view
    depths, confs, nf_masks = [], [], []
    for vid in depth_vids:
        if dnum == 1:
            nfd = sample["near_fars_depth"]
            dvals = nfd[0] + (nfd[1] - nfd[0]) / opt.depth_grid * \
                jnp.arange(opt.depth_grid, dtype=jnp.float32)
            proj = jnp.asarray(sample["proj_mats"][vid])       # [V,3,4]
            d, c, _ = mvsnet_forward(params["mvsnet"], imgs, proj, dvals,
                                     training=False)
            # nearest-upsample h/4 -> full res (reference :330-333)
            d = resize_nearest(d[None], (H, W))[0]
            c = resize_nearest(c[None], (H, W))[0]
        elif dnum >= 2:
            # top-k multi-depth init (reference mvs_points_model.py:318-334):
            # the k highest-probability depth slices per pixel each become a
            # depth hypothesis; confidence = its softmax probability.
            nfd = sample["near_fars_depth"]
            dvals = nfd[0] + (nfd[1] - nfd[0]) / opt.depth_grid * \
                jnp.arange(opt.depth_grid, dtype=jnp.float32)
            proj = jnp.asarray(sample["proj_mats"][vid])
            _, _, prob = mvsnet_forward(params["mvsnet"], imgs, proj, dvals,
                                        training=False)        # [D,h,w]
            d, c = topk_depth_hypotheses(prob, dvals, dnum, (H, W))
        elif dnum == 0:
            d = jnp.asarray(sample["depths_h"][vid])
            c = jnp.ones_like(d)
        else:
            raise NotImplementedError(f"manual_depth_view {dnum}")
        depths.append(d)
        confs.append(c)
        nf_masks.append((d >= near_far[0]) & (d <= near_far[1]))
    depths = jnp.stack(depths)   # [Vd,H,W] camera z-depth ([Vd,dnum,H,W] if dnum>=2)
    confs = jnp.stack(confs)
    nf_masks = jnp.stack(nf_masks)

    K_d = intrinsics[jnp.asarray(depth_vids)]
    E_d = w2cs[jnp.asarray(depth_vids)]
    if dnum >= 2:
        # no geometric consistency for multi-hypothesis init: confidence
        # threshold + near/far only, confidence scaled by 0.3 afterwards
        # (reference filter_utils.py:230-235; reassign_conf asserts
        # manual_depth_view <= 1 there, :271)
        depth_avg = depths
        keep = (confs > opt.depth_conf_thresh) & nf_masks
        confs = confs * 0.3
    elif dnum != 0 and len(depth_vids) >= 1:
        depth_avg, keep, confs, geo_sum = fusion.filter_by_masks(
            depths, K_d, E_d, confs, nf_masks.astype(jnp.float32),
            opt.depth_conf_thresh, opt.geo_cnsst_num)
        if opt.default_conf > 1.0:
            # multi-view-agreement confidence (reference filter_utils.py:268)
            confs = fusion.reassign_conf(confs, geo_sum, opt.geo_cnsst_num)
    else:
        depth_avg = depths
        keep = nf_masks

    out = {"xyz_w": [], "embedding": [], "color": [], "dir": [], "conf": [],
           "keep": []}
    img_feats = fpn_featurenet(params["featurenet"], imgs, training)
    for i, vid in enumerate(depth_vids):
        # gaussian ndc jitter around the fused depth (reference: gau_single_
        # sampler :141-158), then unproject
        key, sub = jax.random.split(key)
        ndc_depth, nf = gau_sample_depth(
            sub, depth_avg[i], opt.manual_std_depth, opt.num_each_depth,
            near_far)
        # ndc_depth is [num,H,W], or [num,dnum,H,W] for multi-hypothesis init
        cam_xyz = depth2point(ndc_depth.reshape(-1, H, W), intrinsics[vid],
                              near_far).reshape(-1, 3)        # [num*C*HW,3]
        conf_rows = jnp.tile(confs[i].reshape(-1, 1), (opt.num_each_depth, 1))
        keep_rows = jnp.tile((keep[i] & nf).reshape(-1), (opt.num_each_depth,))
        if opt.far_plane_shift is not None:
            # background shell: every pixel the fusion REJECTED contributes a
            # low-confidence point at far+shift (reference: filter_utils.py
            # :273-281 keeps the original camera-xy at the shifted depth; here
            # the shell point is unprojected along the pixel ray — geometric-
            # ally on-ray, same capability). conf = 0.02 as in the reference.
            far_z = near_far[1] + jnp.float32(opt.far_plane_shift)
            ndc_far = (far_z - near_far[0]) / (near_far[1] - near_far[0])
            bg_xyz = depth2point(
                jnp.full((1, H, W), ndc_far, jnp.float32), intrinsics[vid],
                near_far).reshape(-1, 3)                      # [HW,3]
            cam_xyz = jnp.concatenate([cam_xyz, bg_xyz], axis=0)
            conf_rows = jnp.concatenate(
                [conf_rows, jnp.full((H * W, 1), 0.02, jnp.float32)], axis=0)
            # bg shell where NO depth hypothesis was accepted for the pixel
            # (reference filter_utils.py:276: sum(final_mask, dim=0) < 1)
            kp = keep[i] if keep[i].ndim == 2 else jnp.any(keep[i], axis=0)
            keep_rows = jnp.concatenate(
                [keep_rows, jnp.logical_not(kp.reshape(-1))], axis=0)
        emb, col, drs, cf = query_embedding(
            params, opt, img_feats, cam_xyz, conf_rows,
            intrinsics, c2ws, w2cs, H, W, vid)
        # to world (reference xyz_ref_lst :364-367, with ref = world here)
        ones = jnp.ones_like(cam_xyz[:, :1])
        xyz_w = (jnp.concatenate([cam_xyz, ones], -1)
                 @ jnp.linalg.inv(w2cs[vid]).T)[:, :3]
        out["xyz_w"].append(xyz_w)
        out["embedding"].append(emb)
        out["color"].append(col)
        out["dir"].append(drs)
        out["conf"].append(cf)
        out["keep"].append(keep_rows)
    return {k: jnp.concatenate(v, axis=0) for k, v in out.items()}
