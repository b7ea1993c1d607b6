"""Point aggregator: per-neighbor shading MLP + inverse-distance interpolation.

TPU-native re-design of the reference PointAggregator
(reference: models/aggregators/point_aggregators.py). The reference compacts valid
(ray, shading, neighbor) rows with boolean-mask gathers (point_aggregators.py:521-643),
which forces dynamic shapes; here every row is computed and invalid contributions are
removed by the weight mask — the per-neighbor MLP becomes one large static-[rows, F]
matmul stack that tiles directly onto the MXU (bf16-ready via `compute_dtype`).

Everything is a pure function of (params, inputs); params are plain pytrees from
init_aggregator_params.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from .networks import init_mlp, apply_mlp, apply_mlp_pieces, activation
from ..ops.pe import positional_encoding
from ..ops.sh import sh_basis
from ..ops.geometry import compute_world2local_dist


# --------------------------------------------------------------------- channel math
def dist_dim(opt) -> int:
    """Reference: point_aggregators.py:243."""
    if opt.agg_dist_pers > 9:
        return 4 if opt.agg_dist_pers == 30 else 6
    return 3


def _kernel_feat_consumed(opt) -> int:
    """Channels of the point embedding consumed by the distance kernel itself
    (reference: point_aggregators.py:279)."""
    if opt.agg_distance_kernel in ("feat_intrp", "meta_intrp"):
        return opt.weight_feat_dim
    if opt.agg_distance_kernel == "sh_intrp":
        return opt.sh_degree ** 2
    if opt.agg_distance_kernel == "gau_intrp":
        return 7
    return 0


def aggregator_dims(opt) -> Dict[str, int]:
    """Mirror viewmlp_init's channel bookkeeping (reference: :276-345)."""
    dd = dist_dim(opt)
    dist_xyz_dim = dd if opt.dist_xyz_freq == 0 else 2 * abs(opt.dist_xyz_freq) * dd
    pnt_channels = (2 * opt.num_pos_freqs * 3) if opt.num_pos_freqs > 0 else 3
    viewdir_channels = (2 * opt.num_viewdir_freqs * 3 + opt.view_ori * 3) \
        if opt.num_viewdir_freqs > 0 else 3

    in_ch = opt.point_features_dim \
        + (0 if opt.agg_feat_xyz_mode == "None" else pnt_channels) \
        - _kernel_feat_consumed(opt)
    in_ch += (2 * opt.num_feat_freqs * in_ch if opt.num_feat_freqs > 0 else 0) \
        + (dist_xyz_dim if opt.agg_intrp_order > 0 else 0)
    block1_in = in_ch

    b1_out = opt.shading_feature_num if opt.shading_feature_mlp_layer1 > 0 else block1_in
    block2_in = b1_out \
        + (0 if opt.agg_feat_xyz_mode == "None" else pnt_channels) \
        + (dist_xyz_dim if (opt.agg_intrp_order > 0 and opt.num_feat_freqs == 0) else 0)
    b2_out = opt.shading_feature_num if opt.shading_feature_mlp_layer2 > 0 else \
        (block2_in if opt.shading_feature_mlp_layer2 > 0 else b1_out)

    block3_in = b2_out \
        + (3 if "1" in list(opt.point_color_mode) else 0) \
        + (4 if "1" in list(opt.point_dir_mode) else 0)
    b3_out = opt.shading_feature_num if opt.shading_feature_mlp_layer3 > 0 else block3_in

    alpha_in = opt.shading_feature_num + \
        (0 if opt.agg_alpha_xyz_mode == "None" else pnt_channels)
    color_in = opt.shading_feature_num + viewdir_channels + \
        (0 if opt.agg_color_xyz_mode == "None" else pnt_channels)
    return {
        "dist_dim": dd, "dist_xyz_dim": dist_xyz_dim,
        "pnt_channels": pnt_channels, "viewdir_channels": viewdir_channels,
        "block1_in": block1_in, "block2_in": block2_in, "block3_in": block3_in,
        "alpha_in": alpha_in, "color_in": color_in, "feat_out": b3_out,
    }


def init_aggregator_params(key, opt) -> Dict:
    """Build the parameter pytree (reference: viewmlp_init :276-348)."""
    dims = aggregator_dims(opt)
    f = opt.shading_feature_num
    keys = jax.random.split(key, 6)
    params = {}
    if opt.shading_feature_mlp_layer1 > 0:
        params["block1"] = init_mlp(
            keys[0], [dims["block1_in"]] + [f] * opt.shading_feature_mlp_layer1,
            opt.act_type)
    if opt.shading_feature_mlp_layer2 > 0:
        params["block2"] = init_mlp(
            keys[1], [dims["block2_in"]] + [f] * opt.shading_feature_mlp_layer2,
            opt.act_type)
    if opt.shading_feature_mlp_layer3 > 0:
        params["block3"] = init_mlp(
            keys[2], [dims["block3_in"]] + [f] * opt.shading_feature_mlp_layer3,
            opt.act_type)
    half = int(f / 2)
    alpha_dims = [dims["alpha_in"]] + [half] * (opt.shading_alpha_mlp_layer - 1) + [1]
    params["alpha_branch"] = init_mlp(keys[3], alpha_dims, opt.act_type,
                                      final_act=False)
    color_dims = [dims["color_in"]] + [half] * (opt.shading_color_mlp_layer - 1) + [3]
    params["color_branch"] = init_mlp(keys[4], color_dims, opt.act_type,
                                      final_act=False)
    if opt.agg_distance_kernel == "feat_intrp":
        in_c = 2 * opt.weight_xyz_freq * 3 + opt.weight_feat_dim
        params["feat_weight_mlp"] = init_mlp(
            keys[5], [in_c, in_c // 2, in_c // 4, 1], opt.act_type, final_act=False)
    return params


# --------------------------------------------------------------------- activations
def raw2out_density(opt, raw):
    """softplus(x-1) mip-nerf stabilization (reference: :262-267)."""
    if opt.act_super > 0:
        return jax.nn.softplus(raw - 1.0)
    return jax.nn.relu(raw)


def raw2out_color(opt, raw):
    """widened sigmoid (reference: :269-273)."""
    c = jax.nn.sigmoid(raw)
    if opt.act_super > 0:
        c = c * (1 + 2 * 0.001) - 0.001
    return c


def gradient_clamp(x, mn=0.0001, mx=1.0):
    """clamp forward, identity backward (reference: :722-724)."""
    clamped = jnp.clip(x, mn, mx)
    return x - jax.lax.stop_gradient(x - clamped)


# --------------------------------------------------------------------- dist kernels
def _axis_weight_arr(opt):
    if opt.agg_axis_weight is None:
        return None
    aw = np.asarray(opt.agg_axis_weight, dtype=np.float32)
    if np.allclose(aw, 1.0):
        return None
    return jnp.asarray(aw)


def compute_weights(opt, params, embedding, dists, pnt_mask, vsize, grid_vox_sz):
    """Distance kernel registry (reference: :355-485).

    dists: [B,R,SR,K,C]; pnt_mask float [B,R,SR,K].
    Returns (weights [B,R,SR,K], embedding') — kernels that consume embedding channels
    return the remainder.
    """
    name = opt.agg_distance_kernel
    aw = _axis_weight_arr(opt)
    if name == "linear":
        if aw is None:
            w = 1.0 / jnp.clip(jnp.linalg.norm(dists[..., :3], axis=-1), 1e-6)
        else:
            w = 1.0 / jnp.clip(
                jnp.sqrt(jnp.sum(jnp.square(dists[..., :2]), axis=-1)) * aw[0]
                + jnp.abs(dists[..., 2]) * aw[1], 1e-6)
        return pnt_mask * w, embedding
    if name == "numlinear":
        if aw is None:
            w = 1.0 / jnp.clip(jnp.linalg.norm(dists, axis=-1), 1e-6)
        else:
            w = 1.0 / jnp.clip(
                jnp.sqrt(jnp.sum(jnp.square(dists[..., :2]), axis=-1)) * aw[0]
                + jnp.abs(dists[..., 2]) * aw[1], 1e-6)
        w = pnt_mask * w
        w = w / jnp.clip(jnp.sum(pnt_mask, axis=-1, keepdims=True), 1.0)
        return w, embedding
    if name == "quadric":
        if aw is None:
            w = 1.0 / jnp.clip(jnp.sum(jnp.square(dists[..., :3]), axis=-1), 1e-8)
        else:
            w = 1.0 / jnp.clip(jnp.sum(jnp.square(dists) * aw, axis=-1), 1e-8)
        return pnt_mask * w, embedding
    if name == "numquadric":
        if aw is None:
            w = 1.0 / jnp.clip(jnp.sum(jnp.square(dists), axis=-1), 1e-8)
        else:
            w = 1.0 / jnp.clip(jnp.sum(jnp.square(dists) * aw, axis=-1), 1e-8)
        return pnt_mask * w, embedding
    if name == "avg":
        return pnt_mask * 1.0, embedding
    if name == "trilinear":
        d = dists * pnt_mask[..., None] / grid_vox_sz
        d = 1.0 - jnp.abs(d)
        w = pnt_mask * d[..., 0] * d[..., 1] * d[..., 2]
        w = w / jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1e-8)
        return w, embedding
    if name == "sh_intrp":
        deg2 = opt.sh_degree ** 2
        dist_norm = jnp.linalg.norm(dists, axis=-1)
        dist_dirs = dists / jnp.clip(dist_norm[..., None], 1e-8)
        shall = sh_basis(dist_dirs, opt.sh_degree, flip_dir=False)
        sh_coefs = embedding[..., :deg2]
        act = {"sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh,
               "passfunc": lambda x: x}[opt.sh_act]
        dfn = {"sh_linear": lambda n: 1.0 / jnp.clip(n, 1e-8),
               "sh_quadric": lambda n: 1.0 / jnp.clip(jnp.square(n), 1e-8),
               "passfunc": lambda n: jnp.ones_like(n)}[opt.sh_dist_func]
        w = pnt_mask * jnp.sum(act(shall * sh_coefs), axis=-1) * dfn(dist_norm)
        return w, embedding[..., deg2:]
    if name == "gau_intrp":
        scale = jnp.abs(embedding[..., 0])
        radii = vsize[2] * 20 * jax.nn.sigmoid(embedding[..., 1:4])
        rotations = jnp.clip(embedding[..., 4:7], -np.pi / 4, np.pi / 4)
        gau = compute_world2local_dist(dists[..., :3], radii, rotations)[..., 0]
        w = pnt_mask * scale * jnp.exp(-0.5 * jnp.sum(jnp.square(gau), axis=-1))
        return w, embedding[..., 7:]
    raise ValueError(f"unsupported agg_distance_kernel {name}")


# --------------------------------------------------------------------- dists modes
def compute_dists(opt, sampled_xyz, sampled_xyz_pers, sample_loc, sample_loc_w,
                  sample_ray_dirs):
    """agg_dist_pers variants (reference: :748-796)."""
    mode = opt.agg_dist_pers
    if mode < 0:
        return jnp.broadcast_to(sample_loc_w[..., None, :], sampled_xyz.shape)
    if mode == 0:
        return sampled_xyz - sample_loc_w[..., None, :]
    if mode == 1:
        return sampled_xyz_pers - sample_loc[..., None, :]
    if mode in (2, 20):
        xd = sampled_xyz_pers[..., 0] * sampled_xyz_pers[..., 2] \
            - sample_loc[..., None, 0] * sample_loc[..., None, 2]
        yd = sampled_xyz_pers[..., 1] * sampled_xyz_pers[..., 2] \
            - sample_loc[..., None, 1] * sample_loc[..., None, 2]
        zd = sampled_xyz_pers[..., 2] - sample_loc[..., None, 2]
        pers = jnp.stack([xd, yd, zd], axis=-1)
        if mode == 2:
            return pers
        return jnp.concatenate([sampled_xyz - sample_loc_w[..., None, :], pers],
                               axis=-1)
    if mode == 10:
        pers = sampled_xyz_pers - sample_loc[..., None, :]
        return jnp.concatenate([sampled_xyz - sample_loc_w[..., None, :], pers],
                               axis=-1)
    if mode == 30:
        w_d = sampled_xyz - sample_loc_w[..., None, :]
        proj = jnp.sum(w_d * sample_ray_dirs[..., None, :], axis=-1, keepdims=True)
        return jnp.concatenate([proj, w_d], axis=-1)
    raise ValueError(f"illegal agg_dist_pers {mode}")


# --------------------------------------------------------------------- forward
def aggregator_forward(params: Dict, opt,
                       sampled_color, sampled_Rw2c, sampled_dir, sampled_conf,
                       sampled_embedding, sampled_xyz_pers, sampled_xyz,
                       sample_pnt_mask, sample_loc, sample_loc_w, sample_ray_dirs,
                       vsize, grid_vox_sz=0.0,
                       compute_dtype=jnp.float32):
    """Shading forward pass (reference PointAggregator.forward :727-814 + viewmlp :488-644).

    All inputs are full [B,R,SR,K,*] / [B,R,SR,*] tensors; invalid neighbors must have
    sample_pnt_mask False. Returns (decoded [B,R,SR,4], ray_valid [B,R,SR] bool,
    weight [B,R,SR,K], conf_coefficient [B,R,SR,K]).
    """
    B, R, SR, K, _ = sampled_xyz.shape
    act = activation(opt.act_type)
    mask_f = sample_pnt_mask.astype(jnp.float32)
    ray_valid = jnp.any(sample_pnt_mask, axis=-1)  # [B,R,SR]

    # ---- v2 fused shade path decision (ops/pallas_trunk.py::fused_shade):
    # dists + linear weights + conf clamp move INSIDE the kernel, whose
    # custom VJP emits the per-attribute cotangents directly — the
    # XLA-composed pre-kernel chain and its backward were ~5 ms/step of
    # [384k,*] HBM round-trips at bench shapes (BASELINE.md round 4).
    fs = getattr(opt, "fused_shade", 0)
    use_shade = (fs != 0 and sampled_Rw2c.ndim == 2
                 and compute_dtype == jnp.float32
                 and sampled_conf is not None
                 and opt.agg_intrp_order in (1, 2))
    if use_shade:
        from ..ops.pallas_trunk import fused_shade_ok
        use_shade = fused_shade_ok(opt) and (
            fs > 0 or jax.default_backend() != "cpu")

    if use_shade:
        dists = weight = conf_coefficient = w_eff = None
    else:
        dists = compute_dists(opt, sampled_xyz, sampled_xyz_pers, sample_loc,
                              sample_loc_w, sample_ray_dirs)

        weight, sampled_embedding = compute_weights(
            opt, params, sampled_embedding, dists, mask_f, vsize, grid_vox_sz)
        if opt.agg_weight_norm > 0 \
                and opt.agg_distance_kernel != "trilinear" \
                and not opt.agg_distance_kernel.startswith("num"):
            weight = weight / jnp.clip(
                jnp.sum(weight, axis=-1, keepdims=True), 1e-8)

        conf_coefficient = jnp.ones_like(weight)
        if sampled_conf is not None:
            conf_coefficient = gradient_clamp(sampled_conf[..., 0], 0.0001,
                                              1.0)
        w_eff = weight * conf_coefficient  # [B,R,SR,K]

    # ---- view directions (per shading point)
    # sampled_Rw2c: [3,3] global, or [B,R,SR,K,3,3] per neighbor (scene
    # editing composes parts with per-point rigid transforms,
    # reference viewmlp :492-506 / run/editing.py:194-212)
    # 3x3 rotations are applied elementwise ((v[...,None] * M).sum(-2)) —
    # exact in f32, unlike TPU dot_general which rounds operands to bf16 at
    # default precision.
    def rot3(v, M):  # v [...,3] @ M [...,3,3]
        return jnp.sum(v[..., :, None] * M, axis=-2)

    uni_w2c = sampled_Rw2c.ndim == 2
    if uni_w2c:
        viewdirs = rot3(sample_ray_dirs,
                        sampled_Rw2c.T.astype(sample_ray_dirs.dtype))
    else:
        rw2cT = jnp.swapaxes(sampled_Rw2c, -1, -2).astype(sample_ray_dirs.dtype)
        # per-ray rotation = first neighbor's (reference :495,506)
        viewdirs = rot3(sample_ray_dirs, rw2cT[:, :, :, 0])
    if opt.num_viewdir_freqs > 0:
        vd = positional_encoding(viewdirs, opt.num_viewdir_freqs, ori=True)
        ori_viewdirs, viewdirs_pe = vd[..., :3], vd[..., 3:]
    else:
        ori_viewdirs, viewdirs_pe = viewdirs, viewdirs

    # ---- per-neighbor features. Kept as a LIST of pieces: apply_mlp_pieces
    # runs the first layer as per-piece matmuls, skipping the concatenated
    # feature matrix and the tile-padded copies a physical concat of narrow
    # slices costs on TPU (measured GBs of HLO temps at production shapes).
    if opt.agg_intrp_order == 0:
        feat = jnp.sum(sampled_embedding * w_eff[..., None], axis=-2)  # [B,R,SR,F]
        pieces = [feat.reshape(-1, feat.shape[-1])]
        if opt.num_feat_freqs > 0:
            pe = positional_encoding(feat, opt.num_feat_freqs)
            pieces.append(pe.reshape(-1, pe.shape[-1]))
    elif use_shade:
        from ..ops.pallas_trunk import fused_shade, pack_trunk_params
        order1 = opt.agg_intrp_order == 1
        Fd = sampled_embedding.shape[-1]
        ddc = dist_dim(opt)
        ops = pack_trunk_params(params, Fd, ddc, opt.num_feat_freqs,
                                abs(opt.dist_xyz_freq),
                                with_alpha=not order1)
        interp = jax.default_backend() == "cpu"
        RT = sampled_Rw2c.T.astype(jnp.float32)
        feat_pt, alpha_pt, w_row, conf_row = fused_shade(
            opt.shading_feature_mlp_layer1, opt.shading_feature_mlp_layer3,
            opt.num_feat_freqs, abs(opt.dist_xyz_freq), K,
            opt.act_super > 0, int(getattr(opt, 'trunk_tile', 512)),
            interp, order1, opt.agg_dist_pers,
            sampled_embedding.reshape(-1, Fd),
            sampled_xyz.reshape(-1, 3), sampled_xyz_pers.reshape(-1, 3),
            sampled_color.reshape(-1, 3), sampled_dir.reshape(-1, 3),
            sampled_conf.reshape(-1, 1), mask_f.reshape(-1, 1),
            sample_loc.reshape(-1, 3), sample_loc_w.reshape(-1, 3),
            ori_viewdirs.reshape(-1, 3), RT, ops)
        weight = w_row.reshape(B, R, SR, K)
        conf_coefficient = conf_row.reshape(B, R, SR, K)
        if order1:
            alpha = raw2out_density(opt, apply_mlp(
                params["alpha_branch"], feat_pt, act, final_act=False,
                compute_dtype=compute_dtype))
        else:
            alpha = alpha_pt
        color = raw2out_color(opt, apply_mlp_pieces(
            params["color_branch"],
            [feat_pt, viewdirs_pe.reshape(B * R * SR, -1)],
            act, final_act=False, compute_dtype=compute_dtype))
        out = jnp.concatenate([alpha, color], axis=-1).reshape(B, R, SR, 4)
        out = out * ray_valid[..., None].astype(out.dtype)
        return out, ray_valid, weight, conf_coefficient
    else:
        d = dists
        if opt.dist_xyz_deno > 0.0:
            d = d / jnp.float32(opt.dist_xyz_deno * np.linalg.norm(vsize))
        # world→local: v @ R_w2c^T (reference pre-transposes then right-
        # multiplies, point_aggregators.py:492,526)
        if uni_w2c:
            dw = rot3(d[..., :3], sampled_Rw2c.T.astype(d.dtype))
        else:
            dw = rot3(d[..., :3], rw2cT)
        d_raw = jnp.concatenate([dw, d[..., 3:]], axis=-1)

        # ---- fused Pallas trunk (ops/pallas_trunk.py): PE + block1 +
        # block3 + alpha head in one VMEM-resident kernel with a custom VJP
        # that recomputes per tile — no [S,284]/[S,256] intermediates ever
        # touch HBM in either direction. Bench A/B: 60.0k -> 72.2k rays/s.
        uf = getattr(opt, "use_fused_trunk", 0)
        use_fused = uf != 0 and uni_w2c and compute_dtype == jnp.float32
        if use_fused:
            from ..ops.pallas_trunk import (fused_trunk, fused_trunk_ok,
                                            pack_trunk_params)
            if uf > 0:
                assert fused_trunk_ok(opt), \
                    "use_fused_trunk=1 with an unsupported aggregator config"
            else:
                # auto: only on a real accelerator (interpret mode on CPU is
                # for parity tests, far too slow for the test suite) and only
                # when the config is inside the kernel's envelope
                use_fused = fused_trunk_ok(opt) \
                    and jax.default_backend() != "cpu"
        if use_fused:
            Fd = sampled_embedding.shape[-1]
            ddc = d_raw.shape[-1]
            sdir_f = rot3(sampled_dir.reshape(-1, 3),
                          sampled_Rw2c.T.astype(jnp.float32))
            ovd_f = jnp.broadcast_to(ori_viewdirs[..., None, :],
                                     (B, R, SR, K, 3)).reshape(-1, 3)
            ex3 = jnp.concatenate(
                [sampled_color.reshape(-1, 3), sdir_f - ovd_f,
                 jnp.sum(sdir_f * ovd_f, axis=-1, keepdims=True)], axis=-1)
            order1 = opt.agg_intrp_order == 1
            ops = pack_trunk_params(params, Fd, ddc, opt.num_feat_freqs,
                                    abs(opt.dist_xyz_freq),
                                    with_alpha=not order1)
            interp = jax.default_backend() == "cpu"
            # order 2: the kernel also applies raw2out_density per neighbor
            # and does the weighted K-aggregation in VMEM — outputs are per
            # shading point ([S/K, ...]), per-neighbor activations never hit
            # HBM. order 1 (dtu_inf/feedforward family): the kernel emits the
            # aggregated features only; the alpha head runs on them below
            # (reference point_aggregators.py:592-599).
            # bf16 MXU operands (f32 accumulate, PE projections f32) are
            # supported but measured a no-op at bench shapes (BASELINE.md
            # round 4) — the kernel is pass-bound, so f32 is the default
            bf16 = getattr(opt, "trunk_dtype", "float32") == "bfloat16" \
                and not interp
            feat_pt, alpha = fused_trunk(
                opt.shading_feature_mlp_layer1,
                opt.shading_feature_mlp_layer3,
                opt.num_feat_freqs, abs(opt.dist_xyz_freq),
                K, opt.act_super > 0,
                int(getattr(opt, 'trunk_tile', 512)), interp, bf16,
                order1,
                sampled_embedding.reshape(-1, Fd),
                d_raw.reshape(-1, ddc), ex3,
                w_eff.reshape(-1, 1), ops)
            F = feat_pt.shape[-1]
            if order1:
                alpha = raw2out_density(opt, apply_mlp(
                    params["alpha_branch"], feat_pt, act, final_act=False,
                    compute_dtype=compute_dtype))
            color = raw2out_color(opt, apply_mlp_pieces(
                params["color_branch"],
                [feat_pt, viewdirs_pe.reshape(B * R * SR, -1)],
                act, final_act=False, compute_dtype=compute_dtype))
            out = jnp.concatenate([alpha, color], axis=-1).reshape(B, R, SR, 4)
            out = out * ray_valid[..., None].astype(out.dtype)
            return out, ray_valid, weight, conf_coefficient

        d = d_raw
        if opt.dist_xyz_freq != 0:
            d = positional_encoding(d, abs(opt.dist_xyz_freq))
        pieces = [sampled_embedding.reshape(-1, sampled_embedding.shape[-1])]
        if opt.num_feat_freqs > 0:
            pe = positional_encoding(sampled_embedding, opt.num_feat_freqs)
            pieces.append(pe.reshape(-1, pe.shape[-1]))
        dists_flat = d.reshape(-1, d.shape[-1])
        pieces.append(dists_flat)

    # ---- MLP trunk (single big matmul stack — the MXU hot loop)
    if opt.shading_feature_mlp_layer1 > 0:
        x = apply_mlp_pieces(params["block1"], pieces, act,
                             compute_dtype=compute_dtype)
    else:
        x = jnp.concatenate(pieces, axis=-1)
    if opt.shading_feature_mlp_layer2 > 0:
        p2 = [x] + ([dists_flat] if opt.agg_intrp_order > 0 else [])
        x = apply_mlp_pieces(params["block2"], p2, act,
                             compute_dtype=compute_dtype)
    if opt.shading_feature_mlp_layer3 > 0:
        extra = [x]
        if sampled_color is not None and "1" in list(opt.point_color_mode):
            extra.append(sampled_color.reshape(-1, 3))
        if sampled_dir is not None and "1" in list(opt.point_dir_mode):
            if uni_w2c:
                sdir = rot3(sampled_dir.reshape(-1, 3),
                            sampled_Rw2c.T.astype(jnp.float32))
            else:
                sdir = rot3(sampled_dir.astype(jnp.float32),
                            rw2cT.astype(jnp.float32)).reshape(-1, 3)
            ovd = jnp.broadcast_to(ori_viewdirs[..., None, :],
                                   (B, R, SR, K, 3)).reshape(-1, 3)
            extra.append(sdir - ovd)
            extra.append(jnp.sum(sdir * ovd, axis=-1, keepdims=True))
        x = apply_mlp_pieces(params["block3"], extra, act,
                             compute_dtype=compute_dtype)

    F = x.shape[-1]
    if opt.agg_intrp_order == 1:
        feat_k = x.reshape(B, R, SR, K, F)
        feat_pt = jnp.sum(feat_k * w_eff[..., None], axis=-2)    # [B,R,SR,F]
        alpha = raw2out_density(opt, apply_mlp(
            params["alpha_branch"], feat_pt.reshape(-1, F), act, final_act=False,
            compute_dtype=compute_dtype))
        color = raw2out_color(opt, apply_mlp_pieces(
            params["color_branch"],
            [feat_pt.reshape(-1, F), viewdirs_pe.reshape(B * R * SR, -1)],
            act, final_act=False, compute_dtype=compute_dtype))
    elif opt.agg_intrp_order == 2:
        # per-neighbor alpha, then interpolate (reference :601-639)
        alpha_k = raw2out_density(opt, apply_mlp(
            params["alpha_branch"], x, act, final_act=False,
            compute_dtype=compute_dtype)).reshape(B, R, SR, K, 1)
        alpha = jnp.sum(alpha_k * w_eff[..., None], axis=-2).reshape(-1, 1)
        feat_k = x.reshape(B, R, SR, K, F)
        feat_pt = jnp.sum(feat_k * w_eff[..., None], axis=-2)
        color = raw2out_color(opt, apply_mlp_pieces(
            params["color_branch"],
            [feat_pt.reshape(-1, F), viewdirs_pe.reshape(B * R * SR, -1)],
            act, final_act=False, compute_dtype=compute_dtype))
    else:  # agg_intrp_order == 0
        alpha = raw2out_density(opt, apply_mlp(
            params["alpha_branch"], x, act, final_act=False,
            compute_dtype=compute_dtype))
        color = raw2out_color(opt, apply_mlp_pieces(
            params["color_branch"], [x, viewdirs_pe.reshape(B * R * SR, -1)],
            act, final_act=False, compute_dtype=compute_dtype))

    out = jnp.concatenate([alpha, color], axis=-1).reshape(B, R, SR, 4)
    out = out * ray_valid[..., None].astype(out.dtype)  # zero invalid shading points
    return out, ray_valid, weight, conf_coefficient
