"""Camera / ray utilities.

Reference anchors: models/neural_points/point_query.py:101-108 (w2pers),
data/data_utils.py:41-69 (ray direction generators). These work both as numpy (data
pipeline, host-side) and jnp (device) functions since they only use ufuncs.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def w2pers(point_xyz_w, camrotc2w, campos):
    """World → perspective camera coords (x/z, y/z, z).

    point_xyz_w: [B, ..., 3]; camrotc2w: [B,3,3] (camera-to-world rotation);
    campos: [B,3]. Matches reference point_query.py:101-108 (xyz_c = R^T (x - c)).
    """
    lead = point_xyz_w.ndim - 2  # number of middle dims
    shift = point_xyz_w - campos.reshape((campos.shape[0],) + (1,) * (lead) + (3,))
    rot_t = jnp.swapaxes(camrotc2w, -1, -2)  # w2c rotation
    rot_t = rot_t.reshape((camrotc2w.shape[0],) + (1,) * lead + (3, 3))
    xyz_c = jnp.sum(shift[..., None, :] * rot_t, axis=-1)
    x = xyz_c[..., 0] / xyz_c[..., 2]
    y = xyz_c[..., 1] / xyz_c[..., 2]
    return jnp.stack([x, y, xyz_c[..., 2]], axis=-1)


def pers2w(point_xyz_pers, camrotc2w, campos):
    """Perspective camera coords → world (inverse of w2pers)."""
    lead = point_xyz_pers.ndim - 2
    z = point_xyz_pers[..., 2]
    xyz_c = jnp.stack([point_xyz_pers[..., 0] * z, point_xyz_pers[..., 1] * z, z], axis=-1)
    rot = camrotc2w.reshape((camrotc2w.shape[0],) + (1,) * lead + (3, 3))
    xyz_w = jnp.sum(xyz_c[..., None, :] * rot, axis=-1)
    return xyz_w + campos.reshape((campos.shape[0],) + (1,) * lead + (3,))


def get_dtu_raydir(pixelcoords, intrinsic, rot_c2w, dir_norm: bool = True):
    """Pixel coords → world-space ray dirs, OpenCV convention (+0.5 pixel center).

    Reference: data/data_utils.py:55-69. pixelcoords: [..., 2] (x, y); intrinsic: [3,3];
    rot_c2w: [3,3]. numpy implementation for the host data pipeline.
    """
    x = (pixelcoords[..., 0] + 0.5 - intrinsic[0, 2]) / intrinsic[0, 0]
    y = (pixelcoords[..., 1] + 0.5 - intrinsic[1, 2]) / intrinsic[1, 1]
    z = np.ones_like(x)
    dirs = np.stack([x, y, z], axis=-1)
    dirs = dirs @ rot_c2w.T
    if dir_norm:
        dirs = dirs / (np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-5)
    return dirs.astype(np.float32)


def get_blender_raydir(pixelcoords, height, width, focal, rot_c2w, dir_norm: bool = True):
    """Blender convention (y up, -z forward). Reference: data/data_utils.py:41-53."""
    x = (pixelcoords[..., 0] + 0.5 - width / 2.0) / focal
    y = (pixelcoords[..., 1] + 0.5 - height / 2.0) / focal
    z = np.ones_like(x)
    dirs = np.stack([x, -y, -z], axis=-1)
    dirs = np.sum(dirs[..., None, :] * rot_c2w[:, :], axis=-1)
    if dir_norm:
        dirs = dirs / (np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-5)
    return dirs.astype(np.float32)


def get_cv_raydir(pixelcoords, height, width, focal, rot, dir_norm: bool = True):
    """OpenCV convention without principal point (reference: data/data_utils.py:3-14)."""
    if isinstance(focal, float):
        focal = [focal, focal]
    x = (pixelcoords[..., 0] - width / 2.0) / focal[0]
    y = (pixelcoords[..., 1] - height / 2.0) / focal[1]
    z = np.ones_like(x)
    dirs = np.stack([x, y, z], axis=-1)
    dirs = np.sum(rot[None, None, :, :] * dirs[..., None], axis=-2)
    if dir_norm:
        dirs = dirs / (np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-5)
    return dirs.astype(np.float32)


def blender2opencv_pose(pose: np.ndarray) -> np.ndarray:
    """Convert blender c2w pose to opencv convention (flip y, z axes)."""
    flip = np.array([[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]],
                    dtype=pose.dtype)
    return pose @ flip
