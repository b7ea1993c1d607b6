"""Learned-probability point initialization (manual_depth_view == -1).

Reference: models/mvs/models.py — the MVSNeRF-variant MVSNet
(build_volume_costvar_img :891-948, forward :950-985), its 8-channel
CostRegNet (:760-811) and ProbNet (:813-821); the sampler/filter pair
gau_single_sampler / prob_filter (mvs_points_model.py:142-195) and the
gen_points wiring (:282-296).

Pipeline per depth view: FPN features (coarsest level, 32ch at H/4) →
plane-sweep cost volume over depth_grid camera depths with spatial `pad`
(channels = V·3 warped RGB + 32 feature variance) → 3D U-Net → ProbNet
softmax over depth → per-pixel expected ndc depth + std → gaussian point
sampling + probability-mass filter.

TPU-native deltas (the reference path is partially unwired — its
photometric-confidence list is never populated on this branch,
mvs_points_model.py:296/349-355 — and no shipped dev_script sets
manual_depth_view=-1):
* prob_filter: the reference gathers depth slices at
  ceil(ndc_expected_depth) ∈ {0,1} (an index bug for a [0,1]-normalized
  value, mvs_points_model.py:187); here the expected depth is scaled to
  slice units first.
* points unproject with the feature-resolution intrinsic, principal point
  shifted by `pad`, so they land on the pixel rays of the padded feature
  grid; the reference mixes the full-resolution intrinsic with padded
  quarter-res dims.
* per-point confidence = the prob_filter neighborhood probability mass —
  a real photometric confidence for query_embedding's point_conf channel.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...ops.interp import grid_sample_2d
from .nets import (batch_norm, cbr, conv_transpose3d, init_bn, init_cbr,
                   init_conv)


# ------------------------------------------------------------------ params
def init_mvsnerf_costreg(key, in_ch: int = 41) -> Dict:
    """8-channel-out 3D U-Net (reference models.py:760-811 — conv12 is
    commented out there, so the output stays at 8 channels)."""
    spec = [("conv0", in_ch, 8, 1), ("conv1", 8, 16, 2), ("conv2", 16, 16, 1),
            ("conv3", 16, 32, 2), ("conv4", 32, 32, 1), ("conv5", 32, 64, 2),
            ("conv6", 64, 64, 1)]
    keys = jax.random.split(key, 10)
    p = {name: init_cbr(keys[i], cin, cout, 3, dims=3)
         for i, (name, cin, cout, _) in enumerate(spec)}
    for i, (name, cin, cout) in enumerate(
            [("conv7", 64, 32), ("conv9", 32, 16), ("conv11", 16, 8)]):
        kk = jax.random.split(keys[7 + i])[0]
        w = init_conv(kk, cin, cout, 3, dims=3)["w"]
        p[name] = {"conv": {"w": jnp.swapaxes(w, 0, 1)}, "bn": init_bn(cout)}
    return p


def init_probnet(key) -> Dict:
    k1, k2 = jax.random.split(key)
    return {"costreg": init_mvsnerf_costreg(k1),
            "prob": init_cbr(k2, 8, 1, 3, dims=3)}


def mvsnerf_costreg(p: Dict, x: jnp.ndarray, training: bool = False
                    ) -> jnp.ndarray:
    """x: [N,41,D,H,W] -> [N,8,D,H,W]. D,H,W must be divisible by 8."""
    c0 = cbr(p["conv0"], x, 1, 1, training, dims=3)
    c2 = cbr(p["conv2"], cbr(p["conv1"], c0, 2, 1, training, dims=3),
             1, 1, training, dims=3)
    c4 = cbr(p["conv4"], cbr(p["conv3"], c2, 2, 1, training, dims=3),
             1, 1, training, dims=3)
    x = cbr(p["conv6"], cbr(p["conv5"], c4, 2, 1, training, dims=3),
            1, 1, training, dims=3)

    def up(pp, x):
        y = batch_norm(pp["bn"], conv_transpose3d(pp["conv"], x), training)
        return jax.nn.relu(y)

    x = c4 + up(p["conv7"], x)
    x = c2 + up(p["conv9"], x)
    return c0 + up(p["conv11"], x)


# ------------------------------------------------------------------ warping
def homo_warp_pad(src: jnp.ndarray, proj: jnp.ndarray,
                  depth_values: jnp.ndarray, pad: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp a src image/feature onto the ref view's depth planes over a
    spatially padded target grid (reference homo_warp with pad,
    mvs_utils.py:264-296). src: [C,h,w]; proj: [3,4]; returns
    ([C,D,h+2p,w+2p] warped, [D,h+2p,w+2p] in-bounds mask)."""
    C, H, W = src.shape
    D = depth_values.shape[0]
    rot, trans = proj[:3, :3], proj[:3, 3:4]
    y, x = jnp.meshgrid(
        jnp.arange(-pad, H + pad, dtype=jnp.float32),
        jnp.arange(-pad, W + pad, dtype=jnp.float32), indexing="ij")
    HP, WP = H + 2 * pad, W + 2 * pad
    xyz = jnp.stack([x.reshape(-1), y.reshape(-1),
                     jnp.ones(HP * WP, jnp.float32)])
    rot_xyz = rot @ xyz
    proj_xyz = rot_xyz[:, None, :] * depth_values[None, :, None] \
        + trans[:, :, None]                                    # [3,D,HPWP]
    proj_xy = proj_xyz[:2] / proj_xyz[2:3]
    gx = proj_xy[0] / ((W - 1) / 2.0) - 1.0
    gy = proj_xy[1] / ((H - 1) / 2.0) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)                        # [D,HPWP,2]
    # align_corners=True matches the (W-1)/2 normalization above and the
    # reference's F.grid_sample(..., align_corners=True) (mvs_utils.py:467-469).
    warped = grid_sample_2d(src, grid, align_corners=True,
                            padding_mode="zeros")
    inb = (jnp.abs(gx) < 1.0) & (jnp.abs(gy) < 1.0)            # [D,HPWP]
    return (jnp.moveaxis(warped, -1, 0).reshape(C, D, HP, WP),
            inb.reshape(D, HP, WP))


def build_volume_costvar_img(imgs: jnp.ndarray, feats: jnp.ndarray,
                             proj_mats: jnp.ndarray,
                             depth_values: jnp.ndarray, pad: int, vid: int
                             ) -> jnp.ndarray:
    """Cost volume channels = [ref RGB | per-src warped RGB | feature
    variance(32)] (reference models.py:891-948). imgs: [V,3,H,W] full res;
    feats: [V,32,h,w] (h=H/4); proj_mats: [V,3,4] relative to ref=vid.
    Returns [3V+32, D, h+2p, w+2p]."""
    V = imgs.shape[0]
    C, h, w = feats.shape[1:]
    D = depth_values.shape[0]
    # bilinear resize full-res images to the feature grid (reference
    # F.interpolate(..., mode='bilinear', align_corners=False))
    imgs_s = jax.image.resize(imgs, (V, 3, h, w), method="linear")

    ref_feat = jnp.pad(feats[vid], ((0, 0), (pad, pad), (pad, pad)))
    ref_img = jnp.pad(imgs_s[vid], ((0, 0), (pad, pad), (pad, pad)))
    HP, WP = h + 2 * pad, w + 2 * pad

    vol_sum = jnp.broadcast_to(ref_feat[:, None], (C, D, HP, WP))
    vol_sq = jnp.square(vol_sum)
    masks = jnp.ones((D, HP, WP), jnp.float32)
    img_blocks = [jnp.broadcast_to(ref_img[:, None], (3, D, HP, WP))]
    for sv in range(V):
        if sv == vid:
            continue
        wf, inb = homo_warp_pad(feats[sv], proj_mats[sv], depth_values, pad)
        wi, _ = homo_warp_pad(imgs_s[sv], proj_mats[sv], depth_values, pad)
        img_blocks.append(wi)
        vol_sum = vol_sum + wf
        vol_sq = vol_sq + jnp.square(wf)
        masks = masks + inb.astype(jnp.float32)
    count = 1.0 / masks
    var = vol_sq * count - jnp.square(vol_sum * count)
    return jnp.concatenate(img_blocks + [var], axis=0)


def probnet_forward(params: Dict, imgs: jnp.ndarray, feats: jnp.ndarray,
                    proj_mats: jnp.ndarray, depth_values: jnp.ndarray,
                    pad: int, vid: int, training: bool = False
                    ) -> jnp.ndarray:
    """Full learned-prob pipeline -> prob volume [D, h+2p, w+2p]
    (softmax over depth; reference ProbNet.forward :817-820)."""
    cost = build_volume_costvar_img(imgs, feats, proj_mats, depth_values,
                                    pad, vid)
    vol = mvsnerf_costreg(params["costreg"], cost[None], training)   # [1,8,...]
    logits = cbr(params["prob"], vol, 1, 1, training, dims=3)[0, 0]
    return jax.nn.softmax(logits, axis=0)


# ------------------------------------------------------------------ sampling
def prob_moments(prob: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expected ndc depth + std from the prob volume
    (reference gau_single_sampler :144-151). prob: [D,h,w]."""
    D = prob.shape[0]
    v = 1.0 / D
    d = (0.5 * v + jnp.arange(D, dtype=jnp.float32) * v)[:, None, None]
    e = jnp.sum(prob * d, axis=0)
    std = jnp.sqrt(jnp.clip(jnp.sum(prob * jnp.square(d - e[None]), axis=0),
                            1e-12))
    return e, std


def prob_filter_mass(prob: jnp.ndarray, expected_ndc: jnp.ndarray,
                     num_neighbor: int) -> jnp.ndarray:
    """Probability mass in the num_neighbor slices around the expected depth
    (reference prob_filter :185-195; slice index = expected·D here — the
    reference ceils the raw [0,1] value)."""
    D = prob.shape[0]
    center = jnp.floor(expected_ndc * D).astype(jnp.int32)     # [h,w]
    lo = center - num_neighbor // 2
    shifts = jnp.arange(num_neighbor, dtype=jnp.int32)
    idx = jnp.clip(lo[None] + shifts[:, None, None], 0, D - 1)  # [n,h,w]
    sel = jnp.take_along_axis(prob, idx, axis=0)
    return jnp.sum(sel, axis=0)                                 # [h,w]
