"""Deterministic voxel-grid construction over a neural point cloud.

TPU-native replacement for the reference's racy CUDA grid build
(reference: models/neural_points/cuda/query_worldcoords.cu:18-162 — claim_occ /
map_coor2occ / fill_occ2pnts). Differences by design:

* The reference claims voxel slots with atomicCAS and reservoir-samples overflow with
  curand (cu:49-74, 150-159), so the point-to-bucket assignment is nondeterministic
  run-to-run. Here the build is a pure function of (xyz, mask): points are sorted by
  voxel id and bucketed in sorted order, keeping the first P per voxel and the first
  max_o occupied voxels. Determinism makes the querier unit-testable.
* The reference rebuilds the grid every iteration (train_ft hot loop §3.2 of SURVEY.md);
  here build_grid is a separate jitted function whose output is carried across steps and
  refreshed only when xyz changes (prune/grow/xyz-grad), configured by
  `Options.grid_rebuild_every`.
* The reference never fills bucket slot 0 due to an off-by-one (`voxel_idx > 0`,
  cu:147); we do not replicate that bug.

The dense `coor_2_occ` / dilated-occupancy arrays live in HBM; for the shipped scenes
vdim is ~10^7 voxels → tens of MB.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class GridSpec:
    """Static grid geometry — part of the jit cache key."""
    ranges_min: Tuple[float, float, float]
    scaled_vsize: Tuple[float, float, float]
    vdim: Tuple[int, int, int]              # number of scaled voxels per axis
    max_o: int                               # max occupied voxels
    P: int                                   # max points per voxel bucket
    kernel_size: Tuple[int, int, int]        # neighbor-search extent (voxels)
    query_size: Tuple[int, int, int]         # occupancy dilation extent (voxels)
    radius_limit: float                      # neighbor radius cap (world units); 0 = off
    vsize: Tuple[float, float, float]        # unscaled voxel size (for shading dists)
    query_max_voxels: int = 0                # cull neighbor voxels to T nearest (0 = off)
    superset_P: int = 0                      # per-voxel neighborhood superset size (0 = off)
    depth_limit: float = 0.0                 # z-axis neighbor cap (frustum query); 0 = off
    pers_metric: bool = False                # True: radius_limit on xy + depth_limit on z
                                             # (perspective-frustum metric); False: spherical
    inv_z: bool = False                      # bucket the z axis in DISPARITY (1/z): the
                                             # frustum --inverse 1 mode (reference
                                             # query_point_indices.py get_hyperparameters);
                                             # ranges_min[2]/vsize[2] are then in 1/z units
                                             # while payload coords/distances stay true-z
    vox_dim: Tuple[int, int, int] = (0, 0, 0)  # NN<0 corner-table dims (0 = off):
    vox_space_min: Tuple[float, float, float] = (0.0, 0.0, 0.0)  # lattice origin
    vox_gvs: float = 0.0                     # lattice pitch (reference grid_vox_sz)
    superset_pad: Tuple[int, int, int] = (0, 0, 0)  # extra voxels per side of the
                                             # superset SOURCE window beyond
                                             # kernel_size, so candidate sets
                                             # stay complete for samples whose
                                             # empty-but-dilated voxel ADOPTS
                                             # this one (shift <= query//2);
                                             # ranking cube expands to match

    @property
    def grid_size_vol(self) -> int:
        return int(self.vdim[0]) * int(self.vdim[1]) * int(self.vdim[2])


def make_grid_spec(opt, points_min=None, points_max=None, max_points: int = 0) -> GridSpec:
    """Host-side hyperparameter computation (reference: point_query.py:47-71).

    ranges = (point bounds ∩ opt.ranges) padded by kernel_size*scaled_vsize/2. The
    reference recomputes bounds from live points per step; we freeze them at
    setup/regrow time so every shape downstream is static.
    """
    vsize = np.asarray(opt.vsize, dtype=np.float64)
    vscale = np.asarray(opt.vscale, dtype=np.float64)
    scaled_vsize = vsize * vscale
    kernel = np.asarray(opt.kernel_size, dtype=np.int32)
    ranges = np.asarray(opt.ranges, dtype=np.float64)
    mn, mx = ranges[:3], ranges[3:]
    if points_min is not None:
        mn = np.maximum(np.asarray(points_min, dtype=np.float64), mn)
    if points_max is not None:
        mx = np.minimum(np.asarray(points_max, dtype=np.float64), mx)
    mn = mn - scaled_vsize * kernel / 2.0
    mx = mx + scaled_vsize * kernel / 2.0
    vdim = np.ceil((mx - mn) / vsize / vscale).astype(np.int32)
    max_o = opt.max_o
    if max_o is None or max_o <= 0:
        max_o = int(max(1, max_points))
    qsize = opt.effective_query_size
    return GridSpec(
        ranges_min=tuple(float(v) for v in mn),
        scaled_vsize=tuple(float(v) for v in scaled_vsize),
        vdim=tuple(int(v) for v in vdim),
        max_o=int(max_o),
        P=int(opt.P),
        kernel_size=tuple(int(k) for k in opt.kernel_size),
        query_size=tuple(int(q) for q in qsize),
        radius_limit=float(opt.radius_limit),
        vsize=tuple(float(v) for v in vsize),
        query_max_voxels=int(getattr(opt, "query_max_voxels", 0)),
        superset_P=int(getattr(opt, "superset_P", 0)),
    )


def voxel_coords(xyz: jnp.ndarray, spec: GridSpec) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World position → integer scaled-voxel coords + in-bounds mask.

    spec.inv_z: the z axis buckets by DISPARITY (1/z) — positions keep true
    z everywhere else (payload rows, distances); only the voxel index
    transform differs (reference --inverse 1, query_point_indices.py).
    """
    if spec.inv_z:
        zt = 1.0 / jnp.maximum(xyz[..., 2:3], 1e-9)
        xyz = jnp.concatenate([xyz[..., :2], zt], axis=-1)
    mn = jnp.asarray(spec.ranges_min, dtype=xyz.dtype)
    vs = jnp.asarray(spec.scaled_vsize, dtype=xyz.dtype)
    coords = jnp.floor((xyz - mn) / vs).astype(jnp.int32)
    vdim = jnp.asarray(spec.vdim, dtype=jnp.int32)
    inb = jnp.all((coords >= 0) & (coords < vdim), axis=-1)
    return coords, inb


def linearize(coords: jnp.ndarray, spec: GridSpec) -> jnp.ndarray:
    """[..., 3] int voxel coords → linear index (row-major, like cu:45)."""
    _, vy, vz = spec.vdim
    return (coords[..., 0] * (vy * vz) + coords[..., 1] * vz + coords[..., 2])


@functools.partial(jax.jit, static_argnames=("spec",))
def build_grid(xyz: jnp.ndarray, point_mask: jnp.ndarray, spec: GridSpec):
    """Build the voxel→bucket structure. Pure function of (xyz, point_mask).

    xyz: [N, 3] float32; point_mask: [N] bool (False = padded/pruned slot).
    Returns a dict with:
      coor_2_occ    [vol] int32        voxel linear id → occupied slot (-1 if empty)
      occ_2_xyz     [max_o, P, 4]      slot → packed (x, y, z, point-idx) bucket rows
      coor_occ_rows [vol/128, 128] i8  occupancy dilated by query_size (cu:105-113),
                                       padded row-major for full-row gathers
      num_occ       [] int32           number of occupied voxels (pre-cap)
    (The reference's separate occ_2_pnts / occ_numpnts tables are folded into
    occ_2_xyz's idx channel — building them separately cost ~66 MB HBM + a
    scatter pass per rebuild at the T&T Barn preset and nothing consumed them;
    tests derive them via grid_debug_tables.)
    """
    N = xyz.shape[0]
    vol = spec.grid_size_vol
    coords, inb = voxel_coords(xyz, spec)
    valid = inb & point_mask
    lin = jnp.where(valid, linearize(coords, spec), vol)  # invalid → sentinel (sorts last)

    order = jnp.argsort(lin, stable=True)                 # deterministic bucketing order
    sorted_lin = lin[order]
    sorted_valid = sorted_lin < vol

    head = jnp.concatenate(
        [sorted_valid[:1],
         (sorted_lin[1:] != sorted_lin[:-1]) & sorted_valid[1:]])
    slot = jnp.cumsum(head.astype(jnp.int32)) - 1         # occupied-voxel slot per point
    num_occ = jnp.sum(head.astype(jnp.int32))

    idx = jnp.arange(N, dtype=jnp.int32)
    seg_start = jax.lax.cummax(jnp.where(head, idx, 0))
    rank = idx - seg_start                                 # index of point within voxel

    keep = sorted_valid & (slot < spec.max_o)

    # coor_2_occ: dense voxel → slot map
    coor_2_occ = jnp.full((vol,), -1, dtype=jnp.int32)
    scat_lin = jnp.where(keep & head, sorted_lin, vol)
    coor_2_occ = coor_2_occ.at[scat_lin].set(
        jnp.where(keep & head, slot, -1), mode="drop")

    # Bucket membership: first P points per voxel in sorted order (deterministic
    # truncation replaces the reference's reservoir sampling, cu:150-159).
    keep_p = keep & (rank < spec.P)
    flat = jnp.where(keep_p, slot * spec.P + rank, spec.max_o * spec.P)

    # bucketed point payload: one contiguous [P,4] tile per occupied voxel —
    # (x, y, z, point_index-as-float) — so the querier reads whole rows from a
    # 2-D table in ONE flat gather (multi-level tile gathers and a separate
    # occ_2_pnts index gather each lower ~15x slower). Point indices are exact
    # in f32 up to 2^24 points. Padded slots park at 1e8 (far).
    payload = jnp.concatenate(
        [jnp.where(keep_p[:, None], xyz[order], 1.0e8),
         jnp.where(keep_p, order, -1).astype(xyz.dtype)[:, None]], axis=-1)
    occ_2_xyz = jnp.full((spec.max_o * spec.P, 4), 1.0e8, dtype=xyz.dtype)
    occ_2_xyz = occ_2_xyz.at[flat].set(payload, mode="drop").reshape(
        spec.max_o, spec.P, 4)

    # dilated occupancy: scatter 1s then max-pool with the query_size window.
    occ = jnp.zeros((vol,), dtype=jnp.int8)
    occ = occ.at[scat_lin].set(jnp.where(keep & head, 1, 0).astype(jnp.int8),
                               mode="drop")
    occ3 = occ.reshape(spec.vdim)
    q = spec.query_size
    # voxel v is marked if an occupied voxel u satisfies v - u ∈ [-(q//2), (q-1)//2]
    # (cu:105-113) ⇔ window over u - v ∈ [-(q-1)//2, q//2].
    pads = tuple(((qq - 1) // 2, qq // 2) for qq in q)
    coor_occ = jax.lax.reduce_window(
        occ3, np.int8(0), jax.lax.max,
        window_dimensions=q, window_strides=(1, 1, 1),
        padding=pads).reshape(-1)

    # row-major [vol/128, 128] copy of the dilated occupancy: the per-sample
    # validity test gathers a FULL 128-lane row and selects the lane with a
    # one-hot product, instead of one scalar gather per ray sample (1.44M
    # scalar gathers at bench shapes: 13.0 ms; row+one-hot: 7.1 ms). Stored
    # int8 — the gather moves 4x fewer bytes than the original f32 table and
    # the one-hot select casts in-register (at the dtu_inf frustum scale of
    # 32.7M voxels the f32 copy cost ~131 MB HBM per per-camera rebuild).
    LW = 128
    volp = -(-vol // LW) * LW
    coor_occ_rows = jnp.pad(coor_occ, (0, volp - vol)).reshape(-1, LW)

    out = {
        "coor_2_occ": coor_2_occ,
        "occ_2_xyz": occ_2_xyz,
        "coor_occ_rows": coor_occ_rows,
        "num_occ": num_occ,
    }

    if spec.vox_dim[0] > 0:
        # NN<0: dense corner->point table for the 8-corner grid query
        from .voxgrid import build_vox_table
        out["vox_table"] = build_vox_table(xyz, point_mask, spec)

    # ---------------------------------------------------------- supersets
    # Per occupied voxel: the superset_P nearest-to-center candidates from its
    # kernel_size³ neighborhood, as one contiguous [P2,4] (x,y,z,idx) row.
    # Amortizes the query's per-sample 27-tile gather into ONE row gather —
    # the neighborhood union is computed once per grid rebuild (init/prune/
    # grow), not once per (sample, step). `coor_slot` maps EVERY dilated voxel
    # to a nearby occupied slot so samples in empty-but-dilated voxels index a
    # superset too (their window shifts by ≤ the dilation radius).
    if spec.superset_P > 0:
        P2 = spec.superset_P
        # voxel coords per occupied slot
        occ_coords = jnp.zeros((spec.max_o, 3), jnp.int32)
        occ_coords = occ_coords.at[jnp.where(keep & head, slot, spec.max_o)].set(
            coords[order], mode="drop")

        kx = spec.kernel_size[0]
        lx = (kx + 1) // 2 - 1
        pads = spec.superset_pad
        ax = [np.arange(-lx - p, lx + p + 1) for p in pads]
        offs = np.stack(np.meshgrid(ax[0], ax[1], ax[2], indexing="ij"),
                        axis=-1).reshape(-1, 3).astype(np.int32)
        O = offs.shape[0]
        vdim_j = jnp.asarray(spec.vdim, jnp.int32)
        mn_j = jnp.asarray(spec.ranges_min, jnp.float32)
        vs_j = jnp.asarray(spec.scaled_vsize, jnp.float32)
        flat_tiles = occ_2_xyz.reshape(spec.max_o, spec.P * 4)

        def build_block(slots):
            cc = occ_coords[slots]                              # [BS,3]
            nb = cc[:, None, :] + jnp.asarray(offs)             # [BS,O,3]
            nb_in = jnp.all((nb >= 0) & (nb < vdim_j), axis=-1)
            nb_lin = jnp.where(nb_in, linearize(nb, spec), 0)
            nb_slot = jnp.where(nb_in, coor_2_occ[nb_lin], -1)  # [BS,O]
            rows = flat_tiles[jnp.maximum(nb_slot, 0).reshape(-1)]
            rows = rows.reshape(-1, O, spec.P, 4)
            center = (cc.astype(jnp.float32) + 0.5) * vs_j + mn_j
            # rank candidates by distance to the voxel CUBE (the nearest any
            # in-voxel sample can be), center distance as tiebreak: pure
            # center ranking drops candidates that are the true nearest for
            # corner samples (measured 0.83 recall at P2=32 on dense
            # clusters; cube ranking recovers the corner cases)
            diff = jnp.abs(rows[..., :3] - center[:, None, None, :])
            # cube half-extent grows by the superset_pad so candidates rank
            # fairly for ANY sample that can adopt this voxel's window
            half = (0.5 + jnp.asarray(pads, jnp.float32)) * vs_j
            d2_cube = jnp.sum(jnp.square(jnp.maximum(diff - half, 0.0)),
                              axis=-1)
            d2_cent = jnp.sum(jnp.square(diff), axis=-1)
            d2 = d2_cube + 1e-3 * d2_cent
            bad = (nb_slot[..., None] < 0) | (d2_cent > 1.0e15)
            d2 = jnp.where(bad, 3.0e38, d2).reshape(-1, O * spec.P)
            rows = rows.reshape(-1, O * spec.P, 4)
            k = min(P2, O * spec.P)   # P2 > pool: take all, pad below
            neg, arg = jax.lax.top_k(-d2, k)
            sel = jnp.take_along_axis(rows, arg[..., None], axis=1)
            sel = jnp.where((-neg < 1.0e15)[..., None], sel, 1.0e8)
            if k < P2:
                sel = jnp.concatenate(
                    [sel, jnp.full((sel.shape[0], P2 - k, 4), 1.0e8)], axis=1)
            # SoA row layout [x·P2 | y·P2 | z·P2 | idx·P2]: the query reads
            # these rows with lane width 4·P2 (=128 at the default P2=32 —
            # exactly one TPU tile). The AoS [..., P2, 4] layout tiles with
            # lane dim 4 → 32x padding; measured 55 ms/step of pure padding
            # traffic at the bench shapes.
            return jnp.concatenate([sel[..., 0], sel[..., 1], sel[..., 2],
                                    sel[..., 3]], axis=-1)       # [BS, 4*P2]

        # block size caps the [blk, O·P, 4] candidate intermediate, whose
        # (8,128) tiling pads the 4-channel minor dim 32x — at the frustum
        # preset's max_o=1e6 an 8-block split asked 34.8 GB of HBM. 4096
        # slots/block keeps the padded intermediate under ~1.2 GB at any
        # max_o; small grids keep the old 8-way split.
        blk = min(-(-spec.max_o // 8), 4096)
        n_blocks = -(-spec.max_o // blk)
        slots_padded = jnp.arange(n_blocks * blk, dtype=jnp.int32) % spec.max_o
        super_xyz = jax.lax.map(build_block,
                                slots_padded.reshape(n_blocks, blk))
        out["super_xyz"] = super_xyz.reshape(-1, 4 * P2)[: spec.max_o]

        # dilated voxel -> NEAREST occupied slot in the query_size window.
        # (A reduce_window max — "any occupied slot in the window" — shifts
        # the adopted candidate window by up to a diagonal: a sample one
        # voxel above a surface could adopt a diagonal neighbor and lose the
        # points directly below it. Measured on the plate scene: 42% of rows
        # got a wrong neighbor set. Distance-ordered adoption removes the
        # systematic shift; runs once per grid rebuild.)
        slot_map = jnp.full((vol,), -1, dtype=jnp.int32)
        slot_map = slot_map.at[scat_lin].set(
            jnp.where(keep & head, slot, -1), mode="drop").reshape(spec.vdim)
        q = spec.query_size
        qoffs = np.stack(np.meshgrid(
            np.arange(-((q[0] - 1) // 2), q[0] // 2 + 1),
            np.arange(-((q[1] - 1) // 2), q[1] // 2 + 1),
            np.arange(-((q[2] - 1) // 2), q[2] // 2 + 1),
            indexing="ij"), axis=-1).reshape(-1, 3)
        qoffs = qoffs[np.argsort(np.sum(qoffs.astype(np.float64) ** 2, -1),
                                 kind="stable")]

        def shift3(a, off):
            """a [X,Y,Z] shifted so out[v] = a[v + off], -1 outside."""
            pads, starts = [], []
            for ax in range(3):
                o = int(off[ax])
                pads.append((max(0, -o), max(0, o)))
                starts.append(max(0, o))
            p = jnp.pad(a, pads, constant_values=-1)
            return jax.lax.dynamic_slice(p, starts, a.shape)

        adopt = slot_map
        for off in qoffs[1:]:                    # (0,0,0) first = own slot
            adopt = jnp.where(adopt >= 0, adopt, shift3(slot_map, off))
        out["coor_slot"] = adopt.reshape(-1)

    return out


def grid_debug_tables(grid, spec: GridSpec):
    """Host-side oracle views of the bucket structure, for tests/debugging.

    The hot build packs everything into occ_2_xyz / coor_occ_rows; this
    reconstructs the reference-shaped tables (occ_2_pnts [max_o,P],
    occ_numpnts [max_o], dense dilated coor_occ [vol]) without them ever
    occupying HBM during training.
    """
    o2x = np.asarray(grid["occ_2_xyz"]).reshape(spec.max_o, spec.P, 4)
    valid = o2x[..., 0] < 1.0e7                       # padded slots park at 1e8
    occ_2_pnts = np.where(valid, o2x[..., 3], -1.0).astype(np.int32)
    occ_numpnts = valid.sum(-1).astype(np.int32)
    coor_occ = np.asarray(grid["coor_occ_rows"]).reshape(-1)[
        : spec.grid_size_vol].astype(np.int8)
    return {"occ_2_pnts": occ_2_pnts, "occ_numpnts": occ_numpnts,
            "coor_occ": coor_occ}
