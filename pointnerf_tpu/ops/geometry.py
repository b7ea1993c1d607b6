"""Geometry helpers (reference: models/helpers/geometrics.py)."""

from __future__ import annotations

import jax.numpy as jnp


def roll_pitch_yaw_to_rotation_matrices(rpy: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] roll/pitch/yaw (radians) → [..., 3, 3] rotation matrices.

    Reference: geometrics.py:45-70 (roll about x, then pitch about y, then yaw about z).
    """
    c = jnp.cos(rpy)
    s = jnp.sin(rpy)
    cx, cy, cz = c[..., 0], c[..., 1], c[..., 2]
    sx, sy, sz = s[..., 0], s[..., 1], s[..., 2]
    rot = jnp.stack([
        cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx,
        sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx,
        -sy, cy * sx, cy * cx,
    ], axis=-1)
    return rot.reshape(rpy.shape[:-1] + (3, 3))


def compute_world2local_dist(dists, radii, rotations):
    """Transform offsets into anisotropic-gaussian local frames.

    Reference: geometrics.py:15-42. dists: [..., 3]; radii: [..., 3];
    rotations: [..., 3]. Returns [..., 3, 1].
    """
    d = dists[..., None]
    rotation = roll_pitch_yaw_to_rotation_matrices(rotations)
    diag = 1.0 / (radii + 1e-8)
    # scale @ rotation where scale = diag_embed(diag): scale rows of rotation.
    tx = rotation * diag[..., None]
    return tx @ d


def vect2euler(xyz: jnp.ndarray) -> jnp.ndarray:
    """Direction vector → euler angles (reference: neural_points.py:613-619)."""
    yz_norm = jnp.linalg.norm(xyz[..., 1:3], axis=-1)
    e_x = jnp.arctan2(-xyz[..., 1], xyz[..., 2])
    e_y = jnp.arctan2(xyz[..., 0], yz_norm)
    e_z = jnp.zeros_like(e_y)
    return jnp.stack([e_x, e_y, e_z], axis=-1)
