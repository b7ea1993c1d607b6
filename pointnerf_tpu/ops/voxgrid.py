"""Regular-lattice point construction + 8-corner voxel-grid query (NN < 0).

The reference's third querier family: with ``--NN -1`` the neural point cloud
is replaced by a regular lattice of grid points covering every occupied
construct-voxel of the input cloud (reference
models/neural_points/neural_points.py:488-515 ``construct_grid_points``), and
each shading sample's K=8 "neighbors" are simply its surrounding grid-cell
corners, looked up in a dense corner->point table (reference :571-573
``vox_query = opt.NN < 0`` gate, :580-592 ``query_vox_grid``). Pairs with the
aggregator's ``trilinear`` distance kernel, which normalizes offsets by the
lattice pitch ``grid_vox_sz`` (reference point_aggregators.py:355-390).

TPU design: the corner table is one flat int32 array over the tight occupied
bounding box (the reference allocates the full ``(grid_res+1)^3`` cube; any
corner outside the occupied box is -1 in both, so semantics match — see
``query_vox_grid``), and the query is 8 gathers from it — static shapes, no
host syncs. The table rebuilds from (xyz, mask) alone: snapped points ARE
lattice points, so the pitch is recoverable from the cloud
(``derive_lattice``), which keeps grid rebuilds pure functions of point state.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp


# ------------------------------------------------------------- host-side init
def construct_grid_points(xyz: np.ndarray, construct_res: int, grid_res: int):
    """Snap a point cloud onto a regular lattice (reference
    neural_points.py:488-515).

    The cloud's bounding cube (1.1 x max extent, centered) is split into
    ``construct_res^3`` construct-voxels; every occupied construct-voxel
    contributes the full ``(cg+1)^3`` lattice of grid-corner points at pitch
    ``space_edge / grid_res`` (cg = grid_res // construct_res), deduplicated.

    Returns (grid_xyz [M,3] float32, grid_vox_sz float) — the corner->index
    table is NOT built here; it is a pure function of the snapped cloud
    (see build_vox_table) so prune/checkpoint/resume need no side state.
    """
    if construct_res <= 0 or grid_res < construct_res:
        raise ValueError(
            f"construct_res={construct_res} grid_res={grid_res}: need "
            "0 < construct_res <= grid_res (reference --construct_res/--grid_res)")
    xyz = np.asarray(xyz, np.float64)
    mn, mx = xyz.min(0), xyz.max(0)
    space_edge = np.max(mx - mn) * 1.1
    mid = (mx + mn) / 2
    space_min = mid - space_edge / 2
    construct_vox_sz = space_edge / construct_res
    grid_vox_sz = space_edge / grid_res

    cvox = np.unique(
        np.floor((xyz - space_min) / construct_vox_sz).astype(np.int64), axis=0)
    cg = int(grid_res / construct_res)
    g = np.arange(cg + 1, dtype=np.int64)
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    corners = np.stack([gx, gy, gz], -1).reshape(1, -1, 3)
    sparse = np.unique((cvox[:, None, :] * cg + corners).reshape(-1, 3), axis=0)
    grid_xyz = (space_min + sparse * grid_vox_sz).astype(np.float32)
    return grid_xyz, float(grid_vox_sz)


def derive_lattice(xyz: np.ndarray) -> Tuple[np.ndarray, float, np.ndarray]:
    """Recover (origin corner, pitch, dims) from a lattice-snapped cloud.

    Every construct-voxel contributes >= 2 consecutive corners per axis, so
    the smallest positive coordinate difference along any axis IS the pitch.
    Requires xyz_grad == 0 (validated in config) — trainable positions would
    drift off-lattice, which the reference's vox path silently mishandles
    too (its full_grid_idx is never rebuilt, neural_points.py:261)."""
    xyz = np.asarray(xyz, np.float64)
    mn = xyz.min(0)
    pitch = np.inf
    for a in range(3):
        u = np.unique(xyz[:, a])
        if len(u) > 1:
            pitch = min(pitch, float(np.min(np.diff(u))))
    if not np.isfinite(pitch):
        raise ValueError("cannot derive lattice pitch from a degenerate cloud")
    dims = np.round((xyz.max(0) - mn) / pitch).astype(np.int64) + 1
    return mn, pitch, dims


# ------------------------------------------------------------- device tables
def build_vox_table(xyz: jnp.ndarray, point_mask: jnp.ndarray, spec) -> jnp.ndarray:
    """Dense corner->point-index table over the occupied bounding box.

    Equivalent to the reference's full_grid_idx scatter
    (neural_points.py:511-513) but sized to the tight box: [prod(vox_dim)]
    int32, -1 = no point at that corner."""
    dims = jnp.asarray(spec.vox_dim, jnp.int32)
    mn = jnp.asarray(spec.vox_space_min, xyz.dtype)
    coords = jnp.round((xyz - mn) / spec.vox_gvs).astype(jnp.int32)
    inb = jnp.all((coords >= 0) & (coords < dims), axis=-1) & point_mask
    vol = int(spec.vox_dim[0]) * int(spec.vox_dim[1]) * int(spec.vox_dim[2])
    lin = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    lin = jnp.where(inb, lin, vol)
    table = jnp.full((vol,), -1, jnp.int32)
    return table.at[lin].set(
        jnp.arange(xyz.shape[0], dtype=jnp.int32), mode="drop")


def query_vox_grid(sample_loc_w: jnp.ndarray, vox_table: jnp.ndarray,
                   spec) -> jnp.ndarray:
    """Shading location -> its 8 surrounding grid-corner point indices.

    Reference neural_points.py:580-592: floor to the cell, gather the 8
    corners, and invalidate the WHOLE sample (-1 x 8) if any corner is
    unoccupied or out of range — trilinear interpolation needs a full cell.
    [B,R,SR,3] -> [B,R,SR,8] int32."""
    dims = jnp.asarray(spec.vox_dim, jnp.int32)
    mn = jnp.asarray(spec.vox_space_min, sample_loc_w.dtype)
    cell = jnp.floor((sample_loc_w - mn) / spec.vox_gvs).astype(jnp.int32)
    shift = jnp.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
         [1, 0, 1], [0, 1, 1], [1, 1, 0], [1, 1, 1]], jnp.int32)
    corner = cell[..., None, :] + shift                       # [B,R,SR,8,3]
    oob = jnp.any((corner < 0) | (corner >= dims), axis=-1)   # [B,R,SR,8]
    corner = jnp.clip(corner, 0, dims - 1)
    lin = (corner[..., 0] * dims[1] + corner[..., 1]) * dims[2] + corner[..., 2]
    inds = jnp.where(oob, -1, vox_table[lin.reshape(-1)].reshape(lin.shape))
    return jnp.where(jnp.any(inds < 0, axis=-1, keepdims=True), -1, inds)
