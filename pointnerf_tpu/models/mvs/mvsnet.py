"""Official MVSNet depth estimation, jax-native.

Reference: models/depth_estimators/{mvsnet.py,module.py}. The plane-sweep
homography warp builds a [V,C,D,h,w] volume; per-view variance forms the cost;
a 3D U-Net regularizes; softmax-expected depth + a 4-tap probability sum give
depth + photometric confidence.

TPU note: the warp is a gather (grid_sample) per depth plane — XLA fuses the
normalization/variance chain; D=192 × h×w × 32ch fits HBM comfortably at the
H/4 feature resolution the reference uses.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...ops.interp import grid_sample_2d
from .nets import costregnet, init_costregnet, init_ofcl_featurenet, ofcl_featurenet


def homo_warping(src_fea: jnp.ndarray, proj: jnp.ndarray,
                 depth_values: jnp.ndarray) -> jnp.ndarray:
    """Warp src features onto the ref view's depth planes
    (reference: module.py:36-71).

    src_fea: [C,h,w]; proj: [3,4] or [4,4] (src_proj @ inv(ref_proj));
    depth_values: [D]. Returns [C,D,h,w].
    """
    C, H, W = src_fea.shape
    D = depth_values.shape[0]
    rot, trans = proj[:3, :3], proj[:3, 3:4]

    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    xyz = jnp.stack([x.reshape(-1), y.reshape(-1),
                     jnp.ones(H * W, jnp.float32)])          # [3, HW]
    rot_xyz = rot @ xyz                                      # [3, HW]
    rot_depth_xyz = rot_xyz[:, None, :] * depth_values[None, :, None]
    proj_xyz = rot_depth_xyz + trans[:, :, None]             # [3, D, HW]
    proj_xy = proj_xyz[:2] / proj_xyz[2:3]
    gx = proj_xy[0] / ((W - 1) / 2.0) - 1.0
    gy = proj_xy[1] / ((H - 1) / 2.0) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)                      # [D, HW, 2]
    # torch grid_sample here uses default align_corners=False
    warped = grid_sample_2d(src_fea, grid, align_corners=False,
                            padding_mode="zeros")            # [D, HW, C]
    return jnp.moveaxis(warped, -1, 0).reshape(C, D, H, W)


def depth_regression(prob: jnp.ndarray, depth_values: jnp.ndarray) -> jnp.ndarray:
    """prob: [D,h,w]; depth_values: [D] -> [h,w] (reference: module.py:73-77)."""
    return jnp.sum(prob * depth_values[:, None, None], axis=0)


def init_mvsnet(key) -> Dict:
    k1, k2 = jax.random.split(key)
    return {"feature": init_ofcl_featurenet(k1),
            "cost_regularization": init_costregnet(k2)}


def mvsnet_forward(params: Dict, imgs: jnp.ndarray, proj_mats: jnp.ndarray,
                   depth_values: jnp.ndarray, training: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """imgs: [V,3,H,W]; proj_mats: [V,3,4] (view 0 = reference, identity);
    depth_values: [D]. Returns (depth [h,w], photometric_confidence [h,w],
    prob_volume [D,h,w]) with h=H/4 (reference: mvsnet.py:98-143).
    """
    V = imgs.shape[0]
    D = depth_values.shape[0]
    features = ofcl_featurenet(params["feature"], imgs, training)  # [V,32,h,w]

    def warp_one(feat, proj):
        return homo_warping(feat, proj, depth_values)

    volumes = jax.vmap(warp_one)(features, proj_mats)        # [V,C,D,h,w]
    mean = jnp.mean(volumes, axis=0)
    variance = jnp.mean(jnp.square(volumes), axis=0) - jnp.square(mean)

    cost = costregnet(params["cost_regularization"], variance[None], training)
    cost = cost[0, 0]                                        # [D,h,w]
    prob_volume = jax.nn.softmax(cost, axis=0)
    depth = depth_regression(prob_volume, depth_values)

    # photometric confidence: sum of the 4 prob bins around the argmax-regressed
    # index (reference: mvsnet.py:131-134 — avg_pool3d(4) * 4 with pad (1,2))
    padded = jnp.pad(prob_volume, ((1, 2), (0, 0), (0, 0)))
    sum4 = padded[:-3] + padded[1:-2] + padded[2:-1] + padded[3:]
    depth_index = depth_regression(
        prob_volume, jnp.arange(D, dtype=jnp.float32)).astype(jnp.int32)
    depth_index = jnp.clip(depth_index, 0, D - 1)
    conf = jnp.take_along_axis(sum4, depth_index[None], axis=0)[0]
    return depth, jax.lax.stop_gradient(conf), prob_volume


mvsnet_forward_jit = jax.jit(mvsnet_forward, static_argnames=("training",))
