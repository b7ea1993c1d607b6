"""Neural-point ray-marching renderer: the full forward pass as one pure function.

TPU-native equivalent of NeuralPointsRayMarching
(reference: models/neural_points_volumetric_model.py:222-364). Key design delta: the
reference compacts valid rays (dynamic R') and scatters results back over the full ray
batch in fill_invalid (reference: :87-123). Here shapes stay static; rays that miss all
occupied voxels simply march through zero density, which makes their color exactly
bg_color and their background transmission exactly 1 — fill_invalid becomes a no-op by
construction.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import raygen, ray_march as rm
from ..ops.camera import w2pers
from ..ops.grid import GridSpec
from ..ops.query import expand_compacted, query_grid_points
from . import neural_points as npc
from .aggregator import aggregator_forward, gradient_clamp


@jax.custom_vjp
def _tier_assemble(valsA, valsB, base, mA, inB, rankA_c, rankB_c,
                   srcA, validA, srcB, validB):
    """Reassemble per-tier aggregator outputs into the compacted row order.

    GATHER form of the tier partition's inverse: row i reads
    valsA[rankA[i]] when it sits in tier A, valsB[rankB[i]] when in tier B
    (and under the wide budget), else `base`. The tier rank is the exact
    packed position (tier_map packs by cumsum), so this equals the
    scatter-form reassembly it replaces — same trick as
    ops/query.py::expand_compacted. custom_vjp because autodiff would
    transpose the gathers back into scatters: the true cotangents are the
    tier gathers themselves (ct_vals[r] = ct[src[r]]).
    """
    out, _ = _tier_assemble_fwd(valsA, valsB, base, mA, inB, rankA_c,
                                rankB_c, srcA, validA, srcB, validB)
    return out


def _bshape(m, ndim):
    return m.reshape(m.shape + (1,) * (ndim - m.ndim))


def _tier_assemble_fwd(valsA, valsB, base, mA, inB, rankA_c, rankB_c,
                       srcA, validA, srcB, validB):
    def gath(vals, rank_c):
        idx = _bshape(rank_c, vals.ndim).astype(jnp.int32)
        return jnp.take_along_axis(vals, idx, axis=1)

    out = jnp.where(_bshape(mA, valsA.ndim), gath(valsA, rankA_c),
                    jnp.where(_bshape(inB, valsB.ndim), gath(valsB, rankB_c),
                              base))
    return out, (mA, inB, srcA, validA, srcB, validB)


def _tier_assemble_bwd(res, ct):
    mA, inB, srcA, validA, srcB, validB = res

    def take(src, valid):
        idx = _bshape(src, ct.ndim).astype(jnp.int32)
        g = jnp.take_along_axis(ct, idx, axis=1)
        return jnp.where(_bshape(valid, ct.ndim), g, 0)

    d_base = jnp.where(_bshape(~mA & ~inB, ct.ndim), ct, 0)
    f0 = jax.dtypes.float0
    z = lambda a: np.zeros(a.shape, f0)
    # rank*_c live in the row space (mA's shape), src*/valid* in tier space
    return (take(srcA, validA), take(srcB, validB), d_base,
            z(mA), z(inB), z(mA), z(mA), z(srcA), z(validA),
            z(srcB), z(validB))


_tier_assemble.defvjp(_tier_assemble_fwd, _tier_assemble_bwd)


def _tiered_aggregate(agg_params, point_state, opt, spec, c_pidx, comp_valid,
                      c_loc, c_loc_w, c_srd, camrotc2w, campos, kt,
                      compute_dtype):
    """Two-tier neighbor-count split of the compacted shade phase.

    Measured at bench shapes, the mean number of valid neighbors per
    compacted shading row is 1.35 of K=8 (17% slot occupancy): a single
    full-K aggregator spends ~5x its rows on masked zeros, and the
    attribute gather and its backward scatter-add move 5x the live rows.
    Rows whose valid neighbors all sit in the first `kt` slots (KNN
    validity is a prefix: missing candidates carry BIG distances, so
    top_k orders them last) run a K=kt aggregator over the full row
    budget (which therefore cannot overflow); the remaining rows run the
    full-K aggregator over a k_tier_wide_frac budget, with overflow
    counted into sr_overflow (driver raise / serving-ladder semantics,
    like SR_budget).

    Exact by construction: the tiers partition the rows, per-row outputs
    are independent, truncated weight slots are zeros exactly as the
    masked single-tier slots were, and the conf value the zero_one loss
    sees at masked slots (the safe-index-0 gather, i.e. point slot 0's
    clamped conf) is reproduced explicitly — including its gradient onto
    point slot 0. The reference aggregates dynamically-compacted rows at
    full K always (point_aggregators.py:521-643); this split is a
    TPU static-shape optimization with no reference analog.

    c_pidx [BG,Ncb,K]; c_loc/c_loc_w/c_srd [BG,Ncb,1,3].
    Returns (c_decoded [BG,Ncb,1,4], c_weight [BG,Ncb,1,K],
    c_conf [BG,Ncb,1,K], wide_overflow []).
    """
    BG, Ncb, Kn = c_pidx.shape
    slot_valid = c_pidx >= 0
    wide = jnp.any(slot_valid[..., kt:], axis=-1)               # [BG,Ncb]
    mA = comp_valid & jnp.any(slot_valid[..., :kt], axis=-1) & ~wide
    mB = comp_valid & wide

    iot = jnp.arange(Ncb, dtype=jnp.int32)

    def tier_map(m, cum, Nt):
        rank = jnp.where(m & (cum <= Nt), cum - 1, Nt + 1 + iot[None])
        src = jax.vmap(
            lambda r: jnp.zeros((Nt + 1,), jnp.int32).at[r].set(
                iot, mode="drop", unique_indices=True)[:Nt])(rank)
        valid = jnp.arange(Nt, dtype=jnp.int32)[None] < jnp.minimum(
            cum[:, -1:], Nt)
        overflow = jnp.sum(jnp.maximum(cum[:, -1] - Nt, 0))
        return src, valid, overflow

    frac = float(getattr(opt, "k_tier_wide_frac", 0.25))
    NtB = min(Ncb, max(128, int(round(Ncb * frac))))
    cumA = jnp.cumsum(mA.astype(jnp.int32), axis=1)             # [BG,Ncb]
    cumB = jnp.cumsum(mB.astype(jnp.int32), axis=1)
    srcA, validA, _ = tier_map(mA, cumA, Ncb)    # full budget: no overflow
    srcB, validB, ovB = tier_map(mB, cumB, NtB)

    def take_rows(a, src, valid, fill):
        idx = src.reshape(src.shape + (1,) * (a.ndim - 2))
        out = jnp.take_along_axis(a, idx, axis=1)
        return jnp.where(
            valid.reshape(valid.shape + (1,) * (a.ndim - 2)), out, fill)

    def run_tier(src, valid, Ktier):
        tp = take_rows(c_pidx, src, valid, -1)[..., :Ktier]     # [BG,Nt,Kt]
        g = npc.gather_neighbors(point_state, tp[:, :, None, :],
                                 camrotc2w, campos)
        dec, _, w_t, cf_t = aggregator_forward(
            agg_params, opt,
            g["sampled_color"], g["Rw2c"], g["sampled_dir"],
            g["sampled_conf"], g["sampled_embedding"],
            g["sampled_xyz_pers"], g["sampled_xyz"],
            g["sample_pnt_mask"],
            take_rows(c_loc, src, valid, 0.0),
            take_rows(c_loc_w, src, valid, 0.0),
            take_rows(c_srd, src, valid, 0.0),
            spec.vsize, compute_dtype=compute_dtype)
        return dec, w_t, cf_t

    decA, wA, cfA = run_tier(srcA, validA, kt)
    decB, wB, cfB = run_tier(srcB, validB, Kn)

    # masked-slot conf as the single-tier computation sees it: the gather's
    # safe index is 0, so every invalid slot carries point slot 0's clamped
    # conf — with a live gradient onto it through the zero_one loss
    conf = point_state.get("conf")
    if conf is not None:
        conf0 = gradient_clamp(conf[0, 0], 0.0001, 1.0)
    else:
        conf0 = jnp.float32(1.0)

    padK = Kn - kt
    wA = jnp.concatenate(
        [wA, jnp.zeros(wA.shape[:-1] + (padK,), wA.dtype)], axis=-1)
    cfA = jnp.concatenate(
        [cfA, jnp.broadcast_to(conf0, cfA.shape[:-1] + (padK,)
                               ).astype(cfA.dtype)], axis=-1)

    # reassembly in GATHER form (see _tier_assemble): row i reads its tier's
    # packed output at rank cum-1; rows in neither tier (or past the wide
    # budget) keep the base value — zeros for decoded/weight, the masked-slot
    # conf0 (with its live gradient) for conf
    rankA_c = jnp.clip(cumA - 1, 0, Ncb - 1)
    rankB_c = jnp.clip(cumB - 1, 0, NtB - 1)
    inB = mB & (cumB - 1 < NtB)
    zero4 = jnp.zeros((BG, Ncb, 1, decA.shape[-1]), decA.dtype)
    c_decoded = _tier_assemble(decA, decB, zero4, mA, inB, rankA_c, rankB_c,
                               srcA, validA, srcB, validB)
    zeroW = jnp.zeros((BG, Ncb, 1, Kn), wA.dtype)
    c_weight = _tier_assemble(wA, wB, zeroW, mA, inB, rankA_c, rankB_c,
                              srcA, validA, srcB, validB)
    base_cf = jnp.broadcast_to(conf0, (BG, Ncb, 1, Kn)).astype(jnp.float32)
    c_conf = _tier_assemble(cfA, cfB, base_cf, mA, inB, rankA_c, rankB_c,
                            srcA, validA, srcB, validB)
    return c_decoded, c_weight, c_conf, ovB


def resolve_occ_segments(opt) -> int:
    """Row budget for the segment-cached occupancy test (0 = dense).

    opt.occ_segments > 0: explicit per-ray distinct-row budget U; -1: auto —
    U=96 on a real accelerator (measured 3.09 vs 4.17 ms at bench shapes,
    BASELINE.md round 5; worst observed distinct-row count 75), dense on CPU
    (the Pallas select kernel would run in interpret mode — tests force it
    explicitly); 0: dense `mask_raypos`. Rays visiting more than U distinct
    occupancy rows get conservative-valid overflow samples, counted in
    items["occ_overflow"].
    """
    v = int(getattr(opt, "occ_segments", 0))
    if v < 0:
        return 96 if jax.default_backend() != "cpu" else 0
    return v


def effective_sr_budget(opt, rows: int) -> int:
    """Shading-row compaction budget for a row space of `rows` = B·R·SR.

    opt.SR_budget > 0: explicit; -1: auto (1/6 of the row space, rounded up
    to 128 lanes — real scenes leave most rows empty, the reference exploits
    the same sparsity with dynamic-shape compaction); 0: off. Drivers watch
    items["sr_overflow"] and raise the budget when rows get dropped.
    """
    Nc = int(opt.SR_budget)
    if Nc < 0:
        Nc = max(128, -(-rows // (6 * 128)) * 128)
    return Nc


class QueryOut(NamedTuple):
    """Result of the non-differentiable query phase (all stop-gradient)."""
    sample_pidx: Optional[jax.Array]         # [B,R,SR,K] int32, -1 = none
                                             # (None when comp is set)
    sample_loc_w: jax.Array                  # [B,R,SR,3]
    ray_mask: jax.Array                      # [B,R] bool
    sample_ray_dirs: Optional[jax.Array]     # [B,R,SR,3] (frustum path only)
    q_overflow: jax.Array                    # [] int32 rows dropped pre-KNN
    comp: Optional[tuple]                    # (comp_src [B,Ncb], comp_valid
                                             #  [B,Ncb], c_pidx [B,Ncb,K],
                                             #  row_valid [B,R,SR], counts
                                             #  [BG,Rg]) per-batch-row pre-
                                             #  compacted query (prefix-form)
    occ_overflow: Optional[jax.Array] = None  # [] int32 rays past the
                                              # occ_segments row budget
                                              # (conservative-valid samples,
                                              # nothing dropped)


def render_query(point_state: Dict, grid: Dict, spec: GridSpec, opt,
                 batch: Dict, key: Optional[jax.Array], is_train: bool,
                 prob: bool = False) -> QueryOut:
    """Non-differentiable phase: ray samples → voxel walk → KNN indices.

    Split out so training can exclude it from the rematerialized region —
    recomputing the query in the backward pass would roughly double step time
    for pure integer outputs that carry no gradients.
    """
    raydir = batch["raydir"]
    campos = batch["campos"]

    if opt.wcoord_query == 0:
        # perspective-frustum path (reference query_point_indices.py): a fresh
        # perspective grid per camera, spec must be a frustum GridSpec
        # (ops.frustum.make_frustum_spec). Returns per-sample ray dirs too.
        # Serving fast path: if the caller passes a prebuilt frustum grid
        # (dict carrying "xyz_pers"), reuse it across this camera's ray
        # chunks instead of rebuilding the 30M-voxel grid per chunk (the
        # reference rebuilds per query_points call, :92-94).
        from ..ops.frustum import build_frustum_grid, query_frustum_points
        if isinstance(grid, dict) and "xyz_pers" in grid:
            fgrid, xyz_pers = grid, grid["xyz_pers"]
        else:
            xyz = jax.lax.stop_gradient(point_state["xyz"])
            fgrid, xyz_pers = build_frustum_grid(
                xyz, point_state["mask"], batch["camrotc2w"], campos, spec)
        B, R = raydir.shape[0], raydir.shape[1]
        Nc = effective_sr_budget(opt, B * R * opt.SR) if not prob else 0
        sample_pidx, sample_loc_w, sample_ray_dirs, ray_mask, q_overflow, \
            comp = query_frustum_points(
                raydir, batch["camrotc2w"], campos, xyz_pers, fgrid, spec,
                SR=opt.SR, K=opt.K, jitter=opt.shpnt_jitter, key=key,
                is_train=is_train, Nc=Nc, rand_mode=opt.NN <= 0)
        return QueryOut(sample_pidx, jax.lax.stop_gradient(sample_loc_w),
                        ray_mask, jax.lax.stop_gradient(sample_ray_dirs),
                        q_overflow, comp)

    # 1. raw depth samples (reference point_query.py:78-81: jitter 0.3 at train)
    gen = raygen.find_ray_generation_method(
        "near_far_disparity_linear" if opt.inverse > 0 else "near_far_linear")
    jitter = 0.3 if is_train else 0.0
    _, _, _, mid_ts = gen(campos, raydir, opt.z_depth_dim,
                          near=batch["near"], far=batch["far"],
                          jitter=jitter, key=key)

    # 2. voxel walk + shading-point compaction + KNN. The KNN runs on the
    # same compacted row budget the shade phase uses (prob mode needs every
    # row's stats, so it stays uncompacted like the shade side).
    B, R = raydir.shape[0], raydir.shape[1]
    if opt.NN < 0:
        # vox-grid mode (reference neural_points.py:571-573): the occupancy
        # walk still picks shading locations, but the K=8 "neighbors" are the
        # sample's surrounding lattice-cell corners — no KNN, no compaction
        # (K=1 below just minimizes the discarded KNN work)
        from ..ops.voxgrid import query_vox_grid
        _, sample_loc_w, ray_mask, q_overflow, _, occ_over = query_grid_points(
            campos, raydir, mid_ts,
            jax.lax.stop_gradient(point_state["xyz"]), grid, spec,
            SR=opt.SR, K=1, Nc=0, occ_U=resolve_occ_segments(opt))
        sample_pidx = query_vox_grid(sample_loc_w, grid["vox_table"], spec)
        return QueryOut(sample_pidx, jax.lax.stop_gradient(sample_loc_w),
                        ray_mask, None, q_overflow, None, occ_over)
    Nc = effective_sr_budget(opt, B * R * opt.SR) if not prob else 0
    (sample_pidx, sample_loc_w, ray_mask, q_overflow, comp,
     occ_over) = query_grid_points(
        campos, raydir, mid_ts,
        jax.lax.stop_gradient(point_state["xyz"]), grid, spec,
        SR=opt.SR, K=opt.K, Nc=Nc, G=int(getattr(opt, "comp_groups", 1)),
        occ_U=resolve_occ_segments(opt))
    return QueryOut(sample_pidx, jax.lax.stop_gradient(sample_loc_w),
                    ray_mask, None, q_overflow, comp, occ_over)


def render_shade(agg_params: Dict,
                 point_state: Dict,
                 spec: GridSpec,
                 opt,
                 batch: Dict,
                 query_out,
                 prob: bool = False,
                 compute_dtype=jnp.float32) -> Dict:
    """Differentiable phase: gather attributes → aggregate → ray march."""
    raydir = batch["raydir"]
    campos = batch["campos"]
    camrotc2w = batch["camrotc2w"]
    B, R, _ = raydir.shape
    # frustum path supplies per-sample ray dirs (reference query_points :101)
    (sample_pidx, sample_loc_w, ray_mask, sample_ray_dirs, q_overflow,
     q_comp) = query_out[:6]
    occ_overflow = query_out[6] if len(query_out) > 6 else None

    # 3. gather neighbor attributes; perspective coords of shading locations
    sample_loc = w2pers(sample_loc_w, camrotc2w, campos)
    if sample_ray_dirs is None:
        sample_ray_dirs = jnp.broadcast_to(raydir[:, :, None, :],
                                           sample_loc.shape)

    # 4. aggregate → per-shading-point [sigma, rgb]
    SR = sample_loc.shape[2]
    S = B * R * SR
    Nc = effective_sr_budget(opt, S)
    use_compaction = q_comp is not None or (0 < Nc < S and not prob)
    if use_compaction:
        # global valid-row compaction: on real scenes most (ray, shading)
        # rows are empty (the reference exploits this with dynamic-shape
        # compaction, cu:381-429); rows with ≥1 neighbor are packed into a
        # fixed budget so the gathers + aggregator MLP run on Nc rows
        # instead of B·R·SR. Overflow rows beyond the budget render empty —
        # size SR_budget to the scene's occupancy. The world-coord querier
        # already compacted (q_comp); the frustum querier returns full-shape
        # indices, so the map is derived here.
        RS = R * SR
        if q_comp is not None:
            # per-batch-row (and per-ray-group, comp_groups > 1) compaction
            # from the query (see query_grid_points): comp_src/comp_valid
            # [B·G,Ncb], c_pidx [B·G,Ncb,K]
            comp_src, comp_valid, c_pidx_mat, ray_valid, counts_g = q_comp
            Ncb = comp_src.shape[1]
            c_pidx = c_pidx_mat[:, :, None, :]                    # [BG,Ncb,1,K]
        else:
            Ncb = -(-Nc // B)
            vmat = jnp.any(sample_pidx >= 0, axis=-1).reshape(B, RS)
            cum = jnp.cumsum(vmat.astype(jnp.int32), axis=1)
            idx_s = jnp.arange(RS, dtype=jnp.int32)
            rank = jnp.where(vmat & (cum <= Ncb), cum - 1,
                             Ncb + 1 + idx_s[None])
            comp_src = jax.vmap(
                lambda r: jnp.zeros((Ncb + 1,), jnp.int32).at[r].set(
                    idx_s, mode="drop", unique_indices=True)[:Ncb])(rank)
            comp_valid = jnp.arange(Ncb)[None] < jnp.minimum(cum[:, -1:], Ncb)
            ray_valid = jnp.any(sample_pidx >= 0, axis=-1)
            counts_g = None                       # mask is not prefix-form
            q_overflow = jnp.sum(jnp.maximum(cum[:, -1] - Ncb, 0)) + q_overflow

        BG = comp_src.shape[0]
        G = BG // B
        rows_g = RS // G

        if G == 1:
            goff = (jnp.arange(B, dtype=jnp.int32) * RS)[:, None]  # [B,1]
            gsrc = (comp_src + goff).reshape(-1)                   # [B·Ncb]

            def compact(a, fill=0):
                flat = a.reshape((S,) + a.shape[3:])
                out = flat[gsrc]
                return jnp.where(
                    comp_valid.reshape((B * Ncb,) + (1,) * (out.ndim - 1)),
                    out, fill).reshape((B, Ncb, 1) + a.shape[3:])
        else:
            # comp_groups: batched per-group gather — every index stays in
            # its group's row block, so GSPMD partitions the gather (and the
            # whole compacted shade phase below) over the ray shards instead
            # of replicating it (scripts/mp_hlo_context.py)
            def compact(a, fill=0):
                blk = a.reshape((BG, rows_g) + a.shape[3:])
                idx = comp_src.reshape((BG, Ncb) + (1,) * (blk.ndim - 2))
                out = jnp.take_along_axis(blk, idx, axis=1)
                return jnp.where(
                    comp_valid.reshape((BG, Ncb) + (1,) * (blk.ndim - 2)),
                    out, fill).reshape((BG, Ncb, 1) + a.shape[3:])

        if q_comp is None:
            c_pidx = compact(sample_pidx, fill=-1)
        c_loc = compact(sample_loc)
        c_loc_w = compact(sample_loc_w)
        c_srd = compact(sample_ray_dirs)

        kt = int(getattr(opt, "k_tier", 0))
        if kt < 0:
            kt = 1
        Kn = c_pidx.shape[-1]
        if 0 < kt < Kn:
            c_decoded, c_weight, c_conf, t_overflow = _tiered_aggregate(
                agg_params, point_state, opt, spec, c_pidx[:, :, 0, :],
                comp_valid, c_loc, c_loc_w, c_srd, camrotc2w, campos, kt,
                compute_dtype)
            q_overflow = q_overflow + t_overflow
        else:
            g = npc.gather_neighbors(point_state, c_pidx, camrotc2w, campos)
            c_decoded, _, c_weight, c_conf = aggregator_forward(
                agg_params, opt,
                g["sampled_color"], g["Rw2c"], g["sampled_dir"],
                g["sampled_conf"], g["sampled_embedding"],
                g["sampled_xyz_pers"], g["sampled_xyz"],
                g["sample_pnt_mask"], c_loc, c_loc_w, c_srd,
                spec.vsize, compute_dtype=compute_dtype)

        if counts_g is not None:
            # prefix-form compaction (compact_row_map): the expansion back to
            # [B,R,SR,C] is a closed-form rank GATHER with a gather backward
            # (q.expand_compacted) — the scatter formulation it replaces
            # profiled 2.2 ms/step at bench shapes for the decoded values
            # alone (48k sequential row-stores)
            def scatter_back(c):
                out = expand_compacted(SR, G == 1, c[:, :, 0], counts_g,
                                       comp_src, comp_valid)
                return out.reshape((B, R, SR) + c.shape[3:])
        # comp_src+goff rows are distinct across and within batch rows, and
        # padded rows get distinct out-of-bounds indices (dropped), so the
        # scatter is provably unique — without the hint XLA lowers it as a
        # sort-based scatter (profiled ~4 ms/step for the decoded values
        # alone)
        elif G == 1:
            scat_idx = jnp.where(
                comp_valid, comp_src + goff,
                S + jnp.arange(B * Ncb, dtype=jnp.int32).reshape(B, Ncb)
            ).reshape(-1)

            def scatter_back(c):
                flat = jnp.zeros((S,) + c.shape[3:], c.dtype).at[
                    scat_idx].set(
                    c.reshape((B * Ncb,) + c.shape[3:]), mode="drop",
                    unique_indices=True)
                return flat.reshape((B, R, SR) + c.shape[3:])
        else:
            # per-group scatters (vmapped over B·G): indices stay inside
            # each group's row block — partitions like the gather above
            scat_idx_g = jnp.where(
                comp_valid, comp_src,
                rows_g + jnp.arange(Ncb, dtype=jnp.int32)[None])   # [BG,Ncb]

            def scatter_back(c):
                upd = c.reshape((BG, Ncb) + c.shape[3:])

                def one(idx, u):
                    return jnp.zeros((rows_g,) + u.shape[1:], c.dtype).at[
                        idx].set(u, mode="drop", unique_indices=True)

                return jax.vmap(one)(scat_idx_g, upd).reshape(
                    (B, R, SR) + c.shape[3:])

        decoded = scatter_back(c_decoded)
        weight = scatter_back(c_weight)
        conf_coefficient = scatter_back(c_conf)
        decoded = decoded * ray_valid[..., None].astype(decoded.dtype)
        sr_overflow = q_overflow
        # compact-form conf/weight for the losses: the zero-one and sparse
        # losses over the FULL [B,R,SR,K] shape cost a sort-based scatter +
        # a 2.3M-element log every step (profiled ~5 ms/step at bench
        # shapes); computed on the Nc·K compacted rows + a closed-form
        # constant for the empty rows they are algebraically identical
        # (losses.py::compute_losses). The scattered full-shape outputs
        # above remain for API parity / eval consumers and are DCE'd from
        # the training program.
        compact_losses = {
            "conf_compact": c_conf,                        # [B,Ncb,1,K]
            "weight_compact": jax.lax.stop_gradient(c_weight),
            # broadcast-shaped against conf_compact so a stacked leading
            # chunk axis (trainer ray_chunk lax.map) broadcasts too
            "compact_valid": comp_valid.reshape(BG, Ncb, 1, 1),
            "zero_one_total": jnp.int32(S * c_conf.shape[-1]),
        }
    else:
        compact_losses = {}
        sr_overflow = jnp.zeros((), jnp.int32) + q_overflow
        g = npc.gather_neighbors(point_state, sample_pidx, camrotc2w, campos)
        decoded, ray_valid, weight, conf_coefficient = aggregator_forward(
            agg_params, opt,
            g["sampled_color"], g["Rw2c"], g["sampled_dir"], g["sampled_conf"],
            g["sampled_embedding"], g["sampled_xyz_pers"], g["sampled_xyz"],
            g["sample_pnt_mask"], sample_loc, sample_loc_w, sample_ray_dirs,
            spec.vsize, grid_vox_sz=spec.vox_gvs, compute_dtype=compute_dtype)

    # 5. ray distances from camera-depth cummax (reference: volumetric model :271-279)
    vz = jnp.float32(spec.vsize[2])
    zs = jax.lax.cummax(sample_loc[..., 2], axis=2)
    ray_dist = jnp.concatenate(
        [zs[..., 1:] - zs[..., :-1],
         jnp.full(zs.shape[:-1] + (1,), vz, dtype=zs.dtype)], axis=-1)
    bad = ray_dist < 1e-8
    if opt.raydist_mode_unit > 0:
        bad = bad | (ray_dist > 2 * vz)
    ray_dist = jnp.where(bad, vz, ray_dist)
    ray_dist = ray_dist * ray_valid.astype(ray_dist.dtype)

    # 6. march + tonemap
    render_func = rm.find_render_function(opt.which_render_func)
    blend_func = rm.find_blend_function(opt.which_blend_func)
    tonemap = rm.find_tone_map(opt.which_tonemap_func)
    bg_color = batch.get("bg_color", None)
    if "bg_ray" in batch:
        bg_color = None
    (ray_color, point_color, opacity, acc_transmission, blend_weight,
     background_transmission, _) = rm.ray_march(
        ray_dist, ray_valid, decoded, render_func, blend_func, bg_color)
    ray_color = tonemap(ray_color)

    output = {
        **compact_losses,
        "coarse_raycolor": ray_color,                     # [B,R,3]
        "coarse_point_opacity": opacity,                  # [B,R,SR]
        "coarse_is_background": background_transmission,  # [B,R,1]
        "coarse_mask": 1.0 - background_transmission,
        "ray_mask": ray_mask,                             # [B,R] bool
        "queried_shading": jnp.logical_not(
            jnp.any(ray_valid, axis=-1, keepdims=True)
        ).astype(jnp.float32).repeat(3, axis=-1),
        "weight": jax.lax.stop_gradient(weight),
        "blend_weight": jax.lax.stop_gradient(blend_weight),
        "conf_coefficient": conf_coefficient,
        # valid rows dropped by the compaction budget (0 = compaction exact)
        "sr_overflow": sr_overflow,
    }
    if occ_overflow is not None:
        # rays past the occ_segments row cache (conservative-valid samples —
        # quality-safe, budget-consuming; see mask_raypos_segmented)
        output["occ_overflow"] = occ_overflow

    # bg_ray composition (reference fill_invalid :103-105): rays that hit keep their
    # rendered color plus bg_ray attenuated by their transmission; missed rays get bg_ray.
    if "bg_ray" in batch:
        output["coarse_raycolor"] = ray_color + batch["bg_ray"] * background_transmission

    if opt.compute_depth or opt.depth_loss_items:
        # Depth convention: CAMERA-SPACE Z (cummax of the perspective sample
        # z), not ray-march distance — the reference supervises ray_ts
        # (neural_points_volumetric_model.py:322), a different
        # parametrization. Camera-z matches sensor depth natively (ScanNet
        # uint16 z-maps); datasets feeding gt_depth must provide camera-z
        # (data/base.py enforces has_metric_depth).
        w = (opacity * acc_transmission)
        zv = jax.lax.cummax(sample_loc[..., 2], axis=2)
        output["coarse_depth"] = jnp.sum(w * zv, axis=-1) / (jnp.sum(w, axis=-1) + 1e-6)

    # 7. probe-mode stats for point growing (reference: :331-362)
    if prob:
        op_max = jnp.max(opacity, axis=-1, keepdims=True)              # [B,R,1]
        op_ind = jnp.argmax(opacity, axis=-1)                           # [B,R]
        take = lambda a: jnp.take_along_axis(
            a, op_ind[..., None, None].repeat(a.shape[-1], -1), axis=2)[:, :, 0]
        output["ray_max_shading_opacity"] = op_max
        output["ray_max_sample_loc_w"] = take(sample_loc_w)             # [B,R,3]
        w_conf = weight * conf_coefficient                               # [B,R,SR,K]
        sel_w = jnp.take_along_axis(
            w_conf, op_ind[..., None, None].repeat(w_conf.shape[-1], -1),
            axis=2)[:, :, 0][..., None]                                  # [B,R,K,1]

        def take_k(a):
            if a is None:
                return None
            return jnp.take_along_axis(
                a, op_ind[..., None, None, None].repeat(a.shape[-2], -2)
                .repeat(a.shape[-1], -1), axis=2)[:, :, 0]               # [B,R,K,C]

        sxyz = take_k(g["sampled_xyz"])
        output["ray_max_far_dist"] = jnp.min(
            jnp.linalg.norm(sxyz - output["ray_max_sample_loc_w"][..., None, :],
                            axis=-1), axis=-1, keepdims=True)
        for name, arr in (("shading_avg_color", take_k(g["sampled_color"])),
                          ("shading_avg_dir", take_k(g["sampled_dir"])),
                          ("shading_avg_conf", take_k(g["sampled_conf"])),
                          ("shading_avg_embedding", take_k(g["sampled_embedding"]))):
            output[name] = None if arr is None else jnp.sum(arr * sel_w, axis=-2)

    return output


def render_forward(agg_params: Dict,
                   point_state: Dict,
                   grid: Dict,
                   spec: GridSpec,
                   opt,
                   batch: Dict,
                   key: Optional[jax.Array],
                   is_train: bool,
                   prob: bool = False,
                   compute_dtype=jnp.float32) -> Dict:
    """Render a batch of rays (query + shade).

    batch: raydir [B,R,3], campos [B,3], camrotc2w [B,3,3], near/far scalars,
    bg_color [B,3] (or None-equivalent), optional bg_ray [B,R,3].
    Returns the reference output dict (coarse_raycolor, ray_mask, opacity, ...).
    """
    query_out = render_query(point_state, grid, spec, opt, batch, key, is_train,
                             prob=prob)
    return render_shade(agg_params, point_state, spec, opt, batch, query_out,
                        prob=prob, compute_dtype=compute_dtype)
