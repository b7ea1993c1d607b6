"""Ray→shading-point→neighbor query over the voxel grid.

TPU-native replacement for the reference's mask_raypos / get_shadingloc /
query_neigh_along_ray_layered CUDA kernels (reference: models/neural_points/cuda/
query_worldcoords.cu:165-302) and the host orchestration (cu:305-433).

Design deltas (SURVEY.md §7.1):
* No data-dependent ray compaction — the reference reads the valid-ray count back to the
  host twice per step (cu:382, 426); here all shapes are static and `ray_mask` is carried
  as a mask. Invalid rays produce zero weights downstream.
* K-nearest neighbors are computed over the kernel_size³ voxel neighborhood in one
  fused gather + top-k (optionally center-culled to the T nearest voxels,
  spec.query_max_voxels), instead of the reference's shell-order-dependent
  max-replace buffer (cu:253-301). When more than K candidates exist the reference
  may keep a non-nearest subset depending on shell visit order; (near-)exact KNN is
  a quality improvement, not a regression.

Performance notes (v5e-1, measured with host-fetch timing):
* all hot lookups are FLAT 2-D row gathers — multi-dim tile gathers lower ~15x slower;
* the per-voxel point payload is packed as (x,y,z,index) rows so one gather serves
  both distances and index translation;
* shading-point compaction is top_k-based (TPU scatter is ~5x slower);
* never trust `block_until_ready` for timing through a remote-tunneled runtime —
  fetch a scalar that depends on the computation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .grid import GridSpec, voxel_coords, linearize

# max elements of the [B,R,D,blk] selection indicator (~512 MB f32) before
# select_shading_t blocks over SR — see its body
_SELECT_BLOCK_LIMIT = 1 << 27


def mask_raypos(raypos: jnp.ndarray, grid, spec: GridSpec) -> jnp.ndarray:
    """[B,R,D,3] ray sample positions → bool validity via dilated occupancy.

    Reference: cu:165-189.
    """
    coords, inb = voxel_coords(raypos, spec)
    lin = jnp.where(inb, linearize(coords, spec), 0)
    rows = grid["coor_occ_rows"]
    # full-row gather + one-hot lane select: one row read per sample beats
    # 1.44M scalar gathers (13.0 -> 7.1 ms at bench shapes) — scalar gathers
    # are latency-bound, row reads ride HBM bandwidth. Rows are int8 (128 B
    # per read); the select runs f32 in-register after the gather.
    LW = rows.shape[-1]
    r = rows[(lin // LW).reshape(-1)].astype(jnp.float32)   # [S, LW]
    onehot = ((lin % LW).reshape(-1, 1)
              == jnp.arange(LW, dtype=lin.dtype)).astype(jnp.float32)
    occ = jnp.sum(r * onehot, axis=-1).reshape(lin.shape)
    return (occ > 0.5) & inb


def mask_raypos_segmented(raypos: jnp.ndarray, grid, spec: GridSpec, U: int,
                          interpret: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Segment-cached occupancy test: exact `mask_raypos` with ~16x fewer gathers.

    Rays march mostly along z — the grid's fastest linearized axis — so a
    ray's D occupancy samples visit only ~24 distinct 128-voxel rows on
    average (scripts/rowcoherence_stats.py). Instead of one row gather PER
    SAMPLE (B·R·D reads, latency-bound: ~3.7 ms at bench shapes), gather
    each ray's ≤U distinct rows ONCE (B·R·U reads) and resolve the
    per-sample (segment, lane) select with an MXU one-hot contraction in
    VMEM — composed in XLA the [D,U]@[U,LW] per-ray product would
    materialize a ~740 MB HBM intermediate. Measured 3.09 vs 4.17 ms/iter
    at S=64 (scripts/occ_micro3.py; the round-3 S=8 reading that shelved
    this idea carried ~4 ms of dispatch latency on both sides).

    Exact whenever a ray visits ≤ U distinct rows (worst case observed at
    bench shapes: 75 with U=96). Rays beyond U fall back to
    CONSERVATIVE-VALID for the overflow samples — a superset of the true
    mask: spurious shading points draw candidates from an adopted voxel
    window whose distances exceed radius_limit, so they aggregate zero
    neighbors; they only consume compaction budget. Overflowing rays are
    counted in the second return value (surfaced as items["occ_overflow"]).

    Returns (valid [B,R,D] bool, n_overflow_rays [] int32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    coords, inb = voxel_coords(raypos, spec)
    lin = jnp.where(inb, linearize(coords, spec), 0)
    rows = grid["coor_occ_rows"]
    LW = rows.shape[-1]
    B, R, D = lin.shape
    N = B * R
    rid = (lin // LW).reshape(N, D)
    lane = (lin % LW).reshape(N, D)
    is_start = jnp.concatenate(
        [jnp.ones((N, 1), bool), rid[:, 1:] != rid[:, :-1]], axis=1)
    # segment rank via a lower-triangular f32 matmul (counts ≤ D are exact
    # in f32; ~0.3 ms cheaper than a lane-axis cumsum at bench shapes)
    tri = jnp.asarray(np.tril(np.ones((D, D), np.float32)))
    rank = (is_start.astype(jnp.float32) @ tri.T).astype(jnp.int32) - 1
    n_overflow = jnp.sum((rank[:, -1] >= U).astype(jnp.int32))

    # per-ray compacted row ids [N,U]: one-hot over the UNCLAMPED rank so
    # segments ≥ U contribute nothing (clamping them onto slot U-1 would sum
    # several rids into a garbage row id read by the rank==U-1 samples)
    oh_u = (rank[:, :, None] == jnp.arange(U, dtype=jnp.int32)
            ).astype(jnp.float32)                                # [N,D,U]
    seg_rid = jnp.einsum(
        "nd,ndu->nu", jnp.where(is_start, rid, 0).astype(jnp.float32),
        oh_u).astype(jnp.int32)                                  # [N,U]
    rows_g = rows[seg_rid.reshape(-1)].reshape(N, U, LW)         # int8

    rank_c = jnp.minimum(rank, U - 1)

    Rt = 16  # rays per grid step (micro-bench optimum; 8/32 within 3%)

    def kern(rows_ref, rank_ref, lane_ref, occ_ref):
        iota_u = jax.lax.broadcasted_iota(jnp.int32, (Rt, D, U), 2)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (Rt, D, LW), 2)
        oh = (rank_ref[...][:, :, None] == iota_u).astype(jnp.bfloat16)
        m = jax.lax.dot_general(
            oh, rows_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)                  # [Rt,D,LW]
        ohl = lane_ref[...][:, :, None] == iota_l
        occ_ref[...] = jnp.sum(jnp.where(ohl, m, 0.0), axis=-1)

    padn = (-N) % Rt
    if padn:
        rows_g = jnp.concatenate(
            [rows_g, jnp.zeros((padn, U, LW), rows_g.dtype)], 0)
        rank_c = jnp.concatenate(
            [rank_c, jnp.zeros((padn, D), rank_c.dtype)], 0)
        lane_p = jnp.concatenate(
            [lane, jnp.zeros((padn, D), lane.dtype)], 0)
    else:
        lane_p = lane
    Np = N + padn
    occ = pl.pallas_call(
        kern,
        grid=(Np // Rt,),
        in_specs=[
            pl.BlockSpec((Rt, U, LW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rt, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rt, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Rt, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, D), jnp.float32),
        interpret=interpret,
    )(rows_g, rank_c, lane_p)[:N]
    occ = jnp.where(rank >= U, 1.0, occ)  # conservative beyond the budget
    return ((occ > 0.5).reshape(B, R, D) & inb), n_overflow


def select_shading_points(raypos: jnp.ndarray, raypos_valid: jnp.ndarray, SR: int
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact the first ≤SR valid samples of each ray into [B,R,SR,3].

    Reference: cumsum-rank host step + get_shadingloc kernel (cu:390-391, 192-214).
    Gather formulation: per-ray top_k over -cumsum picks the depth positions of
    the first SR valid samples in order (TPU scatter — the obvious .at[rank]
    construction — measured ~5x slower than this top_k + take_along_axis).
    """
    B, R, D, _ = raypos.shape
    cum = jnp.cumsum(raypos_valid.astype(jnp.int32), axis=-1)     # [B,R,D]
    ok = raypos_valid & (cum <= SR)
    score = jnp.where(ok, -cum.astype(jnp.float32), -3.0e38)
    vals, args = jax.lax.top_k(score, SR)                         # cum=1 first
    mask = vals > -1.0e38                                         # [B,R,SR]
    sample_loc = jnp.take_along_axis(raypos, args[..., None], axis=2)
    sample_loc = jnp.where(mask[..., None], sample_loc, 0.0)
    return sample_loc, mask


def select_shading_t(tvals: jnp.ndarray, valid: jnp.ndarray, SR: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """t-parameterized shading-point selection: first ≤SR valid depths per ray.

    tvals: [B,R,D] ray-march depths; valid: [B,R,D] occupancy mask.
    Returns (t_sel [B,R,SR], mask [B,R,SR], counts [B,R]).

    Same semantics as select_shading_points (reference cu:192-214) but
    positions stay parameterized by t — callers reconstruct
    ``loc = campos + raydir·t`` so no [B,R,D,3] gather is needed. The
    selection itself is a masked-compare reduction: the (s+1)-th valid
    sample is the unique d with ``cum[d]==s+1 and valid[d]``, so
    ``t_sel[s] = Σ_d t[d]·1(cum[d]=s+1 ∧ valid[d])`` — measured 0.6 ms vs
    2.9 ms for the top_k + take_along_axis formulation at bench shapes
    (TPU top_k is sort-based; take_along_axis lowers to scalar gathers).
    """
    B, R, D = valid.shape
    cum = jnp.cumsum(valid.astype(jnp.int32), axis=-1)            # [B,R,D]
    total = cum[..., -1]                                          # [B,R]
    s_idx = jnp.arange(1, SR + 1, dtype=cum.dtype)                # [SR]

    def sel_block(idx_block):
        hit = ((cum[..., None] == idx_block) & valid[..., None])
        return jnp.einsum("brds,brd->brs", hit.astype(tvals.dtype), tvals)

    # The [B,R,D,blk] comparison feeds a dot, which XLA does NOT fuse its
    # producers into — the indicator materializes. Bound it to ~512 MB by
    # blocking over SR: at train shapes (3600·400·80 ≈ 115M) one block; the
    # WIDE stacked eval/probe programs (18k+ rays per group) would otherwise
    # build a multi-GB intermediate (the round-4 campaign OOM'd HBM at
    # 27 GiB inside a probe render exactly here).
    LIMIT = _SELECT_BLOCK_LIMIT
    if B * R * D * SR <= LIMIT:
        t_sel = sel_block(s_idx)
    else:
        blk = max(1, LIMIT // (B * R * D))
        nblk = -(-SR // blk)
        starts = jnp.arange(nblk, dtype=cum.dtype) * blk
        t_blocks = jax.lax.map(
            lambda s0: sel_block(s0 + jnp.arange(1, blk + 1,
                                                 dtype=cum.dtype)),
            starts)                                               # [n,B,R,blk]
        t_sel = jnp.moveaxis(t_blocks, 0, 2).reshape(
            B, R, nblk * blk)[..., :SR]
    mask = s_idx[None, None] <= total[..., None]                  # [B,R,SR]
    return t_sel, mask, jnp.minimum(total, SR)


def compact_row_map(counts: jnp.ndarray, Ncb: int, SR: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-ray valid-row counts [B,R] → gather-form compaction map.

    Returns (comp_src [B,Ncb] flat (ray·SR+slot) source rows, comp_valid
    [B,Ncb], n_total [B]). Slot s's ray is the last r with rayoff[r] ≤ s
    (#{rayoff ≤ s} − 1, a fused count-compare — measured 0.85 ms vs 1.84 ms
    for the scatter-form map at bench shapes). Slots ≥ n_total hold clamped
    garbage; every consumer masks with comp_valid.
    """
    B, R = counts.shape
    rayoff = jnp.cumsum(counts, axis=-1) - counts             # [B,R] excl
    n_total = rayoff[:, -1] + counts[:, -1]                   # [B]
    slots = jnp.arange(Ncb, dtype=jnp.int32)                  # [Ncb]
    cmp = rayoff[:, None, :] <= slots[None, :, None]          # [B,Ncb,R]
    c_ray = jnp.sum(cmp.astype(jnp.int32), axis=-1) - 1       # [B,Ncb]
    c_s = slots[None] - jnp.take_along_axis(rayoff, c_ray, axis=-1)
    comp_src = jnp.clip(c_ray * SR + c_s, 0, R * SR - 1)      # [B,Ncb]
    comp_valid = slots[None] < jnp.minimum(n_total[:, None], Ncb)
    return comp_src, comp_valid, n_total


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def expand_compacted(SR: int, flat_gather: bool, c: jnp.ndarray,
                     counts_g: jnp.ndarray, comp_src: jnp.ndarray,
                     comp_valid: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the prefix compaction map: [BG,Ncb,...] → [BG,Rg,SR,...].

    The compaction packs each ray's first counts[r] SR-slots densely
    (compact_row_map), so the full→compact rank is CLOSED FORM:
    rank(r, sr) = rayoff[r] + sr, valid iff sr < counts[r] and rank < Ncb.
    Expanding by this rank-gather replaces the scatter-back of compacted
    outputs to [B,R,SR,C] — profiled 2.2 ms/step at bench shapes for the
    decoded values alone (48k sequential row-stores into a march-layout
    buffer) vs ~0.4 ms for the gather. custom_vjp because autodiff would
    transpose the gather into exactly that scatter: the true cotangent is
    the compaction gather itself (ct_c[s] = ct_full[comp_src[s]]), a
    48k-row gather.

    flat_gather: use the flat 2-D row-gather form (single chip fast path);
    False = batched take_along_axis whose indices stay inside each group's
    row block, so GSPMD partitions it per ray shard (comp_groups > 1).
    """
    out, _ = _expand_fwd(SR, flat_gather, c, counts_g, comp_src, comp_valid)
    return out


def _expand_fwd(SR, flat_gather, c, counts_g, comp_src, comp_valid):
    BG, Ncb = c.shape[:2]
    Rg = counts_g.shape[1]
    tail = c.shape[2:]
    rayoff = jnp.cumsum(counts_g, axis=-1) - counts_g             # [BG,Rg]
    sr = jnp.arange(SR, dtype=jnp.int32)
    rank = rayoff[:, :, None] + sr[None, None]                    # [BG,Rg,SR]
    valid = (sr[None, None] < counts_g[:, :, None]) & (rank < Ncb)
    take = jnp.clip(rank, 0, Ncb - 1).reshape(BG, Rg * SR)
    if flat_gather:
        goff = (jnp.arange(BG, dtype=jnp.int32) * Ncb)[:, None]   # [BG,1]
        out = c.reshape((BG * Ncb,) + tail)[(take + goff).reshape(-1)]
        out = out.reshape((BG, Rg * SR) + tail)
    else:
        idx = take.reshape((BG, Rg * SR) + (1,) * len(tail))
        out = jnp.take_along_axis(c, idx, axis=1)
    out = jnp.where(
        valid.reshape((BG, Rg * SR) + (1,) * len(tail)), out, 0)
    return out.reshape((BG, Rg, SR) + tail), (counts_g, comp_src, comp_valid)


def _expand_bwd(SR, flat_gather, res, ct):
    counts_g, comp_src, comp_valid = res
    BG, Ncb = comp_src.shape
    tail = ct.shape[3:]
    ctf = ct.reshape((BG, ct.shape[1] * SR) + tail)
    if flat_gather:
        RS = ctf.shape[1]
        goff = (jnp.arange(BG, dtype=jnp.int32) * RS)[:, None]
        g = ctf.reshape((BG * RS,) + tail)[
            (comp_src + goff).reshape(-1)].reshape((BG, Ncb) + tail)
    else:
        idx = comp_src.reshape((BG, Ncb) + (1,) * len(tail))
        g = jnp.take_along_axis(ctf, idx, axis=1)
    ct_c = jnp.where(comp_valid.reshape((BG, Ncb) + (1,) * len(tail)), g, 0)
    f0 = jax.dtypes.float0
    return (ct_c,
            np.zeros(counts_g.shape, f0),
            np.zeros(comp_src.shape, f0),
            np.zeros(comp_valid.shape, f0))


expand_compacted.defvjp(_expand_fwd, _expand_bwd)


def scatter_row_valid(comp_src: jnp.ndarray, comp_valid: jnp.ndarray,
                      c_has: jnp.ndarray, R: int, SR: int) -> jnp.ndarray:
    """Scatter per-slot has-neighbor bits back to [B,R,SR] (unique indices:
    invalid slots get distinct out-of-bounds targets, so XLA lowers plain
    stores instead of a sort-based scatter)."""
    RS = R * SR
    Ncb = comp_src.shape[1]
    oob = RS + 1 + jnp.arange(Ncb, dtype=jnp.int32)
    return jax.vmap(
        lambda src_b, val_b, has_b: jnp.zeros((RS + 1,), bool).at[
            jnp.where(val_b, src_b, oob)].set(
            has_b, mode="drop", unique_indices=True)[:RS])(
        comp_src, comp_valid, c_has).reshape(-1, R, SR)


def knn_neighbors_superset(sample_loc: jnp.ndarray, sample_mask: jnp.ndarray,
                           grid, spec: GridSpec, K: int) -> jnp.ndarray:
    """Superset-bucket KNN: ONE row gather per shading point.

    Uses grid["coor_slot"] (dilated voxel → nearby occupied slot) and
    grid["super_xyz"] (per occupied voxel: the superset_P nearest-to-center
    (x,y,z,idx) candidates from its kernel³ neighborhood, precomputed at grid
    build). Per-step cost drops from O(samples·27) random reads to
    O(samples); the neighborhood union is amortized over the grid lifetime.
    For samples in empty-but-dilated voxels the candidate window is the
    adopted neighbor voxel's — shifted by ≤ the dilation radius (the
    reference's shell-order truncation is a comparable approximation).
    """
    B, R, SR, _ = sample_loc.shape
    P2 = spec.superset_P
    BIG = jnp.float32(3.0e38)
    S = B * R * SR

    coords, inb = voxel_coords(sample_loc, spec)
    lin = jnp.where(inb, linearize(coords, spec), 0)
    slot = jnp.where(inb & sample_mask, grid["coor_slot"][lin], -1)  # [B,R,SR]

    # rows are SoA [x·P2 | y·P2 | z·P2 | idx·P2] (see grid.build_block): every
    # step below stays in the [S, 4·P2] / [S, P2] layouts — lane width 4·P2 is
    # a full TPU tile at P2=32, where an AoS [..., P2, 4] layout pads 32x.
    rows = grid["super_xyz"][jnp.maximum(slot, 0).reshape(-1)]   # [S, 4·P2]
    loc = sample_loc.reshape(S, 3)
    # d2_j = Σ_axis (row[axis·P2+j] - loc[axis])², computed without splitting
    # the row: subtract the per-axis value tiled across its P2-block, square,
    # zero the idx block, then group-sum with a constant [4·P2, P2] 0/1 matmul
    # (MXU) instead of a reshaped reduction.
    tiled = jnp.concatenate(
        [jnp.repeat(loc, P2, axis=-1),
         jnp.zeros((S, P2), loc.dtype)], axis=-1)                # [S, 4·P2]
    diff = rows - tiled
    sq = jnp.square(diff)
    valid = slot.reshape(S, 1) >= 0
    if spec.pers_metric:
        # frustum metric (reference query_point_indices.py:476): radius cap
        # on perspective xy + separate depth cap on z; same two group-sum
        # matmuls, split xy / z
        keep_xy = np.zeros((4 * P2, P2), np.float32)
        for a in range(2):
            keep_xy[a * P2: (a + 1) * P2] = np.eye(P2, dtype=np.float32)
        dxy2 = sq @ jnp.asarray(keep_xy)                         # [S, P2]
        dz2 = sq[:, 2 * P2: 3 * P2]
        d2 = dxy2 + dz2
        valid = valid & (d2 < 1.0e15)
        if spec.radius_limit > 0:
            valid = valid & (dxy2 <= spec.radius_limit * spec.radius_limit)
        if spec.depth_limit > 0:
            valid = valid & (dz2 <= spec.depth_limit * spec.depth_limit)
    else:
        keep3 = np.zeros((4 * P2, P2), np.float32)
        for a in range(3):
            keep3[a * P2: (a + 1) * P2] = np.eye(P2, dtype=np.float32)
        d2 = sq @ jnp.asarray(keep3)                             # [S, P2]
        valid = valid & (d2 < 1.0e15)
        if spec.radius_limit > 0:
            valid = valid & (d2 <= spec.radius_limit * spec.radius_limit)
    d2 = jnp.where(valid, d2, BIG)

    neg_top, arg = jax.lax.top_k(-d2, K)
    best_d = -neg_top
    # decode candidate position -> point index WITHOUT take_along_axis: that
    # lowers to ~S·K scalar gathers (measured ~45 ms/step at bench shapes —
    # twice the rest of the query combined). A one-hot contraction against
    # the float idx channel stays in the wide vector layout; indices are
    # exact in f32 below 2^24 points.
    onehot = (arg[..., None] == jnp.arange(P2, dtype=arg.dtype)
              ).astype(jnp.float32)                              # [S, K, P2]
    best_i = jnp.einsum("skp,sp->sk", onehot,
                        rows[:, 3 * P2:]).astype(jnp.int32)
    return jnp.where(best_d < BIG, best_i, -1).reshape(B, R, SR, K)


def knn_neighbors(sample_loc: jnp.ndarray, sample_mask: jnp.ndarray,
                  xyz: jnp.ndarray, grid, spec: GridSpec, K: int,
                  rand_key: "Optional[jax.Array]" = None) -> jnp.ndarray:
    """For each shading point find K nearest neural points in the kernel neighborhood.

    sample_loc: [B,R,SR,3] (world); sample_mask: [B,R,SR]; xyz: [N,3].
    Returns sample_pidx [B,R,SR,K] int32 with -1 for missing neighbors.
    Reference: cu:217-302.

    rand_key (frustum NN<=0 sub-mode, reference query_rand_along_ray,
    query_point_indices.py:414-491): instead of the K NEAREST, keep K
    candidates sampled uniformly without replacement from the kernel-window
    candidates that satisfy the radius/depth caps — the reference's
    first-K + curand reservoir replacement has exactly that distribution.
    Here it is a top-k over threefry priorities: deterministic given the
    key (the reference seeds with wall time; determinism is this
    framework's documented improvement, SURVEY.md §5).

    TPU layout: all O=kernel³ neighbor voxels are gathered at once as
    contiguous [P,3] xyz tiles (grid["occ_2_xyz"], built once per grid), the
    O·P candidate distances are computed in one fused elementwise pass, and a
    single top-k selects the neighbors. (A scan over offsets with per-step
    top_k merges was ~5x slower: 27 serialized sorts + scattered point
    gathers; flat 2-D row gathers of packed (x,y,z,idx) tiles are the fast
    path — see stage comments.)
    """
    B, R, SR, _ = sample_loc.shape
    P = spec.P
    BIG = jnp.float32(3.0e38)

    coords, _ = voxel_coords(sample_loc, spec)  # [B,R,SR,3]

    kx, _, _ = spec.kernel_size
    lx = (kx + 1) // 2 - 1  # reference shell loop bound (cu:256)
    offs = np.stack(np.meshgrid(
        np.arange(-lx, lx + 1), np.arange(-lx, lx + 1), np.arange(-lx, lx + 1),
        indexing="ij"), axis=-1).reshape(-1, 3).astype(np.int32)
    offs = jnp.asarray(offs)                                 # [O,3]
    O = offs.shape[0]

    vdim = jnp.asarray(spec.vdim, dtype=jnp.int32)
    c = coords[..., None, :] + offs                          # [B,R,SR,O,3]
    inb = jnp.all((c >= 0) & (c < vdim), axis=-1)
    lin = jnp.where(inb, linearize(c, spec), 0)
    slot = jnp.where(inb & sample_mask[..., None],
                     grid["coor_2_occ"][lin], -1)            # [B,R,SR,O]

    # stage 1 — voxel cull: keep the T nearest CANDIDATE voxels by center
    # distance. The [P,3] tile gather is the query's dominant HBM traffic
    # (random ~100B reads); culling 27 -> T cuts it proportionally while a
    # non-selected voxel almost never holds a true K-nearest point (its
    # center is farther than T-th best).
    T = spec.query_max_voxels
    if rand_key is not None:
        T = 0  # random mode scans the FULL kernel window (reference
        #        query_rand_along_ray has no shell/cull structure); a
        #        center-distance cull would bias the uniform sample
    if 0 < T < O:
        mn = jnp.asarray(spec.ranges_min, sample_loc.dtype)
        vs = jnp.asarray(spec.scaled_vsize, sample_loc.dtype)
        centers = (c.astype(sample_loc.dtype) + 0.5) * vs + mn
        dc = jnp.sum(jnp.square(centers - sample_loc[..., None, :]), axis=-1)
        dc = jnp.where(slot >= 0, dc, BIG)
        _, vox_arg = jax.lax.top_k(-dc, T)                   # [B,R,SR,T]
        slot = jnp.take_along_axis(slot, vox_arg, axis=-1)
        O = T
    safe_slot = jnp.maximum(slot, 0)

    # stage 2 — ONE flat 2-D row gather of the packed (x,y,z,idx) tiles.
    # Multi-level tile gathers ([max_o,P,3] with slice (1,P,3)) lower ~15x
    # slower than flat row gathers (measured 4M rows: ~28ms flat); packing the
    # point index as a float 4th channel removes the occ_2_pnts gather.
    rows = grid["occ_2_xyz"].reshape(spec.max_o, P * 4)[
        safe_slot.reshape(-1)].reshape(B, R, SR, O, P, 4)
    cxyz = rows[..., :3]
    cand_idx = rows[..., 3].astype(jnp.int32).reshape(B, R, SR, O * P)
    d2 = jnp.sum(jnp.square(cxyz - sample_loc[..., None, None, :]), axis=-1)
    valid = (slot[..., None] >= 0) & (d2 < 1.0e15)           # padded tiles → far
    if spec.pers_metric:
        # frustum metric (reference query_point_indices.py:476): radius cap on
        # perspective xy, separate depth cap on z
        diff = cxyz - sample_loc[..., None, None, :]
        if spec.radius_limit > 0:
            dxy2 = jnp.sum(jnp.square(diff[..., :2]), axis=-1)
            valid = valid & (dxy2 <= spec.radius_limit * spec.radius_limit)
        if spec.depth_limit > 0:
            valid = valid & (jnp.square(diff[..., 2])
                             <= spec.depth_limit * spec.depth_limit)
    elif spec.radius_limit > 0:
        valid = valid & (d2 <= spec.radius_limit * spec.radius_limit)
    d2 = jnp.where(valid, d2, BIG).reshape(B, R, SR, O * P)

    # stage 3 — top-k selection; position→index decode as a one-hot
    # contraction (take_along_axis lowers to per-element gathers, see
    # knn_neighbors_superset)
    if rand_key is not None:
        # K uniform-without-replacement among cap-valid candidates: top-k of
        # per-candidate threefry priorities (ties have measure zero)
        pri = jax.random.uniform(rand_key, d2.shape, minval=0.0, maxval=1.0)
        score = jnp.where(d2 < BIG, pri, -1.0)
        top_pri, arg = jax.lax.top_k(score, K)
        best_d = jnp.where(top_pri >= 0.0, 0.0, BIG)  # reuse the <BIG gate
    else:
        neg_top, arg = jax.lax.top_k(-d2, K)
        best_d = -neg_top
    onehot = (arg[..., None] == jnp.arange(O * P, dtype=arg.dtype)
              ).astype(jnp.float32)
    best_i = jnp.einsum("...kp,...p->...k", onehot,
                        cand_idx.astype(jnp.float32)).astype(jnp.int32)
    return jnp.where(best_d < BIG, best_i, -1)


@functools.partial(jax.jit,
                   static_argnames=("spec", "SR", "K", "Nc", "G", "occ_U"))
def query_grid_points(campos: jnp.ndarray, raydir: jnp.ndarray,
                      tvals: jnp.ndarray, xyz: jnp.ndarray, grid,
                      spec: GridSpec, SR: int, K: int, Nc: int = 0,
                      G: int = 1, occ_U: int = 0):
    """Full query pipeline (reference host orchestration cu:305-433, uncompacted).

    campos [B,3], raydir [B,R,3], tvals [B,R,D] jittered ray-march depths
    (from ops.raygen); xyz: [N,3]. Sample positions are reconstructed as
    ``campos + raydir·t`` wherever needed instead of materializing a
    [B,R,D,3] position tensor and gathering rows out of it.
    Nc > 0: run the KNN only on the first Nc occupancy-valid shading rows
    (the same compaction budget the shade phase uses — real scenes leave most
    of the B·R·SR row space empty, so the KNN's row gather + top-k shrink
    ~6x). Rows beyond the budget get no neighbors and are counted in
    q_overflow, exactly like the shade-side compaction counter.

    occ_U > 0: segment-cached occupancy test (mask_raypos_segmented) with a
    per-ray row budget of occ_U — exact unless a ray visits more distinct
    128-voxel rows, where its overflow samples go conservative-valid and the
    ray is counted in occ_overflow.

    Returns (sample_pidx [B,R,SR,K] or None, sample_loc_w [B,R,SR,3],
             ray_mask [B,R] bool, q_overflow [] int32, comp,
             occ_overflow [] int32).
    When Nc is active sample_pidx is None and comp = (comp_src [B,Ncb],
    comp_valid [B,Ncb], c_pidx [B,Ncb,K], row_valid [B,R,SR],
    counts [BG,Rg] per-ray prefix counts) with
    Ncb = ceil(Nc/(B·G)) — compaction is PER BATCH ROW (each camera's rows
    pack into its own budget slice), so multi-camera batches and batch-axis
    data parallelism keep the per-row camera association and the cumsum never
    crosses a batch boundary. For B == 1, G == 1 the program is identical to
    a flat compaction. The shade phase consumes the compacted indices
    directly.

    G > 1 (opt.comp_groups — set to the mesh's ray-plane size by the
    parallel factories): each batch row's R rays split into G contiguous
    groups, each compacted into its own Ncb budget slice, and the comp
    leaves carry a [B·G, ...] leading dim. Every gather/scatter between the
    row space and the compacted space is then a BATCHED op over the group
    axis — block-local to a ray shard — so GSPMD keeps the whole shade +
    backward phase partitioned over the mesh. (With one global budget the
    compaction gather's arbitrary cross-shard indices force GSPMD to
    replicate the entire compacted phase per device — measured as
    full-global-row-count MLPs in the partitioned HLO,
    scripts/mp_hlo_context.py.) When the budget covers all valid rows the
    computed row SET is identical to G == 1; only the packing differs.
    """
    raypos = campos[:, None, None, :] + raydir[:, :, None, :] * tvals[..., None]
    occ_overflow = jnp.zeros((), jnp.int32)
    if occ_U > 0:
        rp_valid, occ_overflow = mask_raypos_segmented(
            raypos, grid, spec, occ_U,
            interpret=jax.default_backend() == "cpu")
    else:
        rp_valid = mask_raypos(raypos, grid, spec)
    t_sel, sample_mask, counts = select_shading_t(tvals, rp_valid, SR)
    sample_loc_w = jnp.where(
        sample_mask[..., None],
        campos[:, None, None, :] + raydir[:, :, None, :] * t_sel[..., None],
        0.0)
    B, R = raydir.shape[0], raydir.shape[1]
    S = B * R * SR
    RS = R * SR
    q_overflow = jnp.zeros((), jnp.int32)

    def knn(loc, mask):
        if spec.superset_P > 0:
            return knn_neighbors_superset(loc, mask, grid, spec, K)
        return knn_neighbors(loc, mask, xyz, grid, spec, K)

    if 0 < Nc < S:
        G = max(1, G)
        if R % G:
            raise ValueError(
                f"comp_groups={G} must divide the per-camera ray count "
                f"R={R} (the ray-plane mesh size divides any pow2 chunk)")
        BG, Rg = B * G, R // G
        Ncb = -(-Nc // BG)
        # two-level offsets: per-ray counts came free from select_shading_t,
        # so the compaction map needs only a [B·G,R/G] cumsum — no R·SR-long
        # lane cumsum (lane-axis scans over 288k elements were ~0.5 ms)
        comp_src, comp_valid, n_total = compact_row_map(
            counts.reshape(BG, Rg), Ncb, SR)
        if G == 1:
            # flat row gather with per-batch offsets (take_along_axis lowers
            # to per-element gathers; the flat 2-D form is the fast path on
            # a single chip)
            goff = (jnp.arange(B, dtype=jnp.int32) * RS)[:, None]  # [B,1]
            c_loc = sample_loc_w.reshape(S, 3)[
                (comp_src + goff).reshape(-1)].reshape(B, Ncb, 3)
        else:
            # batched (per-group) gather: indices stay within each group's
            # row block, so GSPMD partitions it as a purely local gather per
            # ray shard — the point of comp_groups
            blk = sample_loc_w.reshape(BG, Rg * SR, 3)
            c_loc = jnp.take_along_axis(blk, comp_src[..., None], axis=1)
        c_pidx = knn(c_loc[:, :, None, :],
                     comp_valid[:, :, None])                      # [BG,Ncb,1,K]
        c_pidx = jnp.where(comp_valid[..., None], c_pidx[:, :, 0], -1)
        # rows with ≥1 neighbor, scattered back to full shape (ONE scalar
        # scatter per row; the [BG,Ncb,K] indices themselves stay compacted
        # and flow straight into the shade phase's gathers)
        c_has = comp_valid & jnp.any(c_pidx >= 0, axis=-1)         # [BG,Ncb]
        row_valid = scatter_row_valid(comp_src, comp_valid, c_has,
                                      Rg, SR).reshape(B, R, SR)
        ray_mask = jnp.any(row_valid, axis=-1)
        q_overflow = jnp.sum(jnp.maximum(n_total - Ncb, 0))
        comp = (comp_src, comp_valid, c_pidx, row_valid,
                counts.reshape(BG, Rg))
        return None, sample_loc_w, ray_mask, q_overflow, comp, occ_overflow

    sample_pidx = knn(sample_loc_w, sample_mask)
    # a ray stays valid only if at least one shading point found a neighbor (cu:425-427)
    ray_mask = jnp.any(sample_pidx.reshape(sample_pidx.shape[:2] + (-1,)) >= 0, axis=-1)
    return sample_pidx, sample_loc_w, ray_mask, q_overflow, None, occ_overflow
