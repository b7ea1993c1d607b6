"""Shared driver machinery: point-cloud init, full-image rendering, CLI plumbing.

Reference anchors: run/train_ft.py:636-732 (BRANCH C point loading), :252-414
(chunked test render), models/mvs/mvs_utils.py:537-561 (voxel downsample).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Options, PRESETS
from ..models import neural_points as npc
from ..ops.grid import make_grid_spec, build_grid
from ..train import trainer
from ..data.base import chunks_of_item


# ----------------------------------------------------------------- CLI plumbing
def options_from_cli(argv=None, base: Optional[Options] = None) -> Options:
    """argparse over the Options dataclass — same flag names as the reference's
    ~150 argparse flags (reference: options/base_options.py)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", type=str, default="",
                        help="preset name, e.g. nerf_synth:lego")
    parser.add_argument("--config", type=str, default="",
                        help="path to an Options json")
    known, unknown = parser.parse_known_args(argv)

    if known.config:
        with open(known.config) as f:
            base = Options.from_json(f.read())
    elif known.preset:
        name, _, scan = known.preset.partition(":")
        base = PRESETS[name](scan or "lego")
    base = base or Options()

    fields = {f.name: f for f in dataclasses.fields(Options)}
    over = argparse.ArgumentParser()
    for name, f in fields.items():
        cur = getattr(base, name)
        if isinstance(cur, bool):
            over.add_argument(f"--{name}", type=int, default=None)
        elif isinstance(cur, tuple):
            elem = float if (len(cur) and isinstance(cur[0], float)) else \
                (int if (len(cur) and isinstance(cur[0], int)) else str)
            over.add_argument(f"--{name}", type=elem, nargs="*", default=None)
        elif cur is None:
            over.add_argument(f"--{name}", type=str, default=None)
        else:
            over.add_argument(f"--{name}", type=type(cur), default=None)
    ns = over.parse_args(unknown)
    kw = {}
    for name in fields:
        v = getattr(ns, name)
        if v is None:
            continue
        cur = getattr(base, name)
        if isinstance(cur, bool):
            v = bool(v)
        elif isinstance(cur, tuple):
            v = tuple(v)
        elif cur is None and name == "max_o":
            v = int(v)
        elif cur is None and name in ("mvs_lr", "far_plane_shift"):
            v = float(v)
        kw[name] = v
    from ..config import validate_options
    return validate_options(base.replace(**kw) if kw else base)


# ------------------------------------------------------------- point-cloud init
def construct_vox_points_closest(xyz: np.ndarray, vox_res: int,
                                 ranges: Optional[np.ndarray] = None
                                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Voxel downsample keeping the point nearest each voxel centroid.

    Reference: mvs_utils.construct_vox_points_closest (mvs_utils.py:537-561,
    via torch_scatter); here deterministic numpy. Returns (kept xyz, kept idx).
    """
    xyz = np.asarray(xyz, np.float64)
    if ranges is None:
        mn, mx = xyz.min(0), xyz.max(0)
    else:
        mn, mx = np.asarray(ranges[:3]), np.asarray(ranges[3:])
    span = np.maximum(mx - mn, 1e-9)
    vsize = span.max() / vox_res
    coords = np.floor((xyz - mn) / vsize).astype(np.int64)
    dims = coords.max(0) + 1
    lin = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]

    order = np.argsort(lin, kind="stable")
    lin_s = lin[order]
    starts = np.flatnonzero(np.concatenate([[True], lin_s[1:] != lin_s[:-1]]))
    counts = np.diff(np.concatenate([starts, [len(lin_s)]]))

    # centroid per voxel, then nearest point to it — fully vectorized: a
    # second sort keyed (voxel, distance) makes each voxel's first element
    # its winner (ties break to the lowest original index, same as argmin).
    # The per-voxel python loop this replaces took minutes at ScanNet merge
    # scale (tens of millions of points, ~1M occupied voxels).
    xyz_s = xyz[order]
    sums = np.add.reduceat(xyz_s, starts, axis=0)
    centroids = sums / counts[:, None]
    seg_id = np.repeat(np.arange(len(starts)), counts)     # per sorted point
    d = np.sum((xyz_s - centroids[seg_id]) ** 2, axis=-1)
    order2 = order[np.lexsort((d, lin_s))]
    keep = order2[starts]
    keep.sort()
    return xyz[keep].astype(np.float32), keep


def _vox_partition(xyz: np.ndarray, vox_res: int,
                   space_min=None, space_max=None):
    """Centered cubic voxel partition shared by the `construct_vox_points_*`
    family (reference mvs_utils.py:484-500: space_edge = 1.05 x the max
    extent, centered on the cloud midpoint; when space_min/max are given the
    per-axis edge is reused so two clouds share one partition)."""
    xyz = np.asarray(xyz, np.float64)
    if space_min is None:
        mn, mx = xyz.min(0), xyz.max(0)
        edge = np.max(mx - mn) * 1.05
        mid = (mx + mn) / 2
        space_min, space_max = mid - edge / 2, mid + edge / 2
    else:
        space_min = np.asarray(space_min, np.float64)
        space_max = np.asarray(space_max, np.float64)
        edge = space_max - space_min
    coords = np.floor((xyz - space_min) / (edge / vox_res)).astype(np.int32)
    return coords, space_min, space_max


def construct_vox_points_xyz(xyz: np.ndarray, vox_res: int,
                             space_min=None, space_max=None) -> np.ndarray:
    """Voxel downsample to per-voxel centroids (reference
    mvs_utils.construct_vox_points_xyz, mvs_utils.py:503-518; used by the
    ScanNet per-frame depth backprojection, scannet_ft_dataset.py:444)."""
    xyz = np.asarray(xyz, np.float64)
    coords, _, _ = _vox_partition(xyz, vox_res, space_min, space_max)
    _, inv = np.unique(coords, axis=0, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    inv_s = inv[order]
    starts = np.flatnonzero(np.concatenate([[True], inv_s[1:] != inv_s[:-1]]))
    counts = np.diff(np.concatenate([starts, [len(inv_s)]]))
    sums = np.add.reduceat(xyz[order], starts, axis=0)
    return (sums / counts[:, None]).astype(np.float32)


def construct_vox_points_ind(xyz: np.ndarray, vox_res: int,
                             space_min=None, space_max=None):
    """Voxel ids for cross-cloud occupancy filtering (reference
    mvs_utils.construct_vox_points_ind, mvs_utils.py:520-535). Returns
    (unique voxel coords [V,3] int32, per-point index into them [N],
    space_min, space_max)."""
    coords, smin, smax = _vox_partition(xyz, vox_res, space_min, space_max)
    uniq, inv = np.unique(coords, axis=0, return_inverse=True)
    return uniq, inv.astype(np.int64), smin, smax


def filter_depth_by_pc_occupancy(pc_xyz: np.ndarray, depth_xyz: np.ndarray,
                                 filter_res: int = 100) -> np.ndarray:
    """Keep only depth-backprojected points whose voxel holds NO provided-
    cloud point — the load_points==3 mesh+sensor-depth merge (reference
    run/train_ft.py:656-672: construct_vox_points_ind over both clouds in a
    shared partition, a dense 0/1 mask over the union bounding box)."""
    pc_gid, _, smin, smax = construct_vox_points_ind(pc_xyz, filter_res)
    d_gid, d_inv, _, _ = construct_vox_points_ind(
        depth_xyz, filter_res, space_min=smin, space_max=smax)
    all_g = np.concatenate([pc_gid, d_gid], 0).astype(np.int64)
    mn = all_g.min(0)
    dims = all_g.max(0) - mn + 1

    def lin(g):
        g = g.astype(np.int64) - mn
        return (g[:, 0] * dims[1] + g[:, 1]) * dims[2] + g[:, 2]

    occupied = np.zeros(int(dims.prod()), bool)
    occupied[lin(pc_gid)] = True
    keep = ~occupied[lin(d_gid)[d_inv]]
    return np.asarray(depth_xyz)[keep]


def load_pretrained_mvsnet(path: str) -> Dict:
    """Load the official-MVSNet depth-estimator checkpoint the reference
    finetune scripts depend on (--pre_d_est MVSNet/model_000014.ckpt,
    reference mvs_points_model.py:51-73, dev_scripts/w_n360/lego.sh:31)."""
    import torch
    from ..models.mvs.nets import import_official_mvsnet
    sd = torch.load(path, map_location="cpu", weights_only=False)
    return import_official_mvsnet(sd)


def gen_points_filter_embeddings(opt, dataset, key,
                                 mvs_params: Optional[Dict] = None) -> Dict:
    """BRANCH B of the reference driver (run/train_ft.py:51-167): per-triplet
    MVS depth → fusion → per-point embeddings, then a visual-hull alpha mask
    over all init views and a voxel downsample."""
    from ..models.mvs import points_model as pm
    from ..models.mvs.fusion import alpha_masking

    if mvs_params is None:
        key, sub = jax.random.split(key)
        mvs_params = pm.init_mvs_points_params(sub, opt)
        if opt.pre_d_est:
            mvs_params = dict(mvs_params,
                              mvsnet=load_pretrained_mvsnet(opt.pre_d_est))

    parts = {k: [] for k in ("xyz_w", "embedding", "color", "dir", "conf")}
    alphas, intr, w2cs = [], [], []
    for ti in range(len(dataset.view_id_list)):
        sample = dataset.get_init_item(ti)
        key, sub = jax.random.split(key)
        out = pm.gen_points(mvs_params, opt, sample, sub)
        keep = np.asarray(out["keep"]).astype(bool)
        for k in parts:
            parts[k].append(np.asarray(out[k])[keep])
        alphas.append(sample["alphas"][0])
        intr.append(sample["intrinsics"][0])
        w2cs.append(sample["w2cs"][0])
    merged = {k: np.concatenate(v, axis=0) for k, v in parts.items()}

    # visual hull over the init views (reference: train_ft.py:130-134)
    hull = np.asarray(alpha_masking(
        jnp.asarray(merged["xyz_w"]), jnp.asarray(np.stack(alphas)),
        jnp.asarray(np.stack(intr)), jnp.asarray(np.stack(w2cs)),
        ranges=np.asarray(opt.ranges) if opt.ranges[0] > -99.0 else None))
    merged = {k: v[hull] for k, v in merged.items()}

    if opt.vox_res > 0:
        _, idx = construct_vox_points_closest(merged["xyz_w"], opt.vox_res)
        merged = {k: v[idx] for k, v in merged.items()}

    if 0 < opt.default_conf <= 1.0:
        # uniform starting confidence (reference: neural_points.py:281-283)
        merged["conf"] = np.full_like(merged["conf"], opt.default_conf)
    return npc.create_point_cloud(
        merged["xyz_w"], merged["embedding"], merged["color"],
        merged["dir"][:, :3], merged["conf"])


def init_point_state_from_dataset(opt, dataset, key) -> Dict:
    """BRANCH C of the reference driver (train_ft.py:636-732): load provided
    points, crop to ranges, voxel-downsample, init per-point attributes.

    Without the MVS embedding network (build phase 6) features follow
    opt.feature_init_method; colors come from the ply when present.
    """
    # loader choice mirrors reference load_points ∈ {1: provided cloud,
    # 2: sensor-depth backprojection, 3: both} (train_ft.py:649-673)
    rgb = None
    sources = None
    if opt.cloud_path:
        # pickled surface cloud (reference neural_points.py:240-262:
        # load_blender_cloud -> point_noise -> construct_grid_points; this
        # path bypasses the driver's ranges/vox_res/resample processing)
        from ..data.load_blender import load_blender_cloud, apply_point_noise
        rng_cloud = np.random.RandomState(opt.seed)
        xyz, _ = load_blender_cloud(opt.cloud_path, opt.num_point, rng_cloud)
        xyz = apply_point_noise(xyz, opt.point_noise, rng_cloud)
        if opt.construct_res > 0:
            from ..ops.voxgrid import construct_grid_points
            xyz, _ = construct_grid_points(
                xyz, opt.construct_res, opt.grid_res)
        return _finish_point_state(opt, dataset, key, xyz.astype(np.float32),
                                   None)
    if opt.load_points == 2 and hasattr(dataset, "load_init_depth_points"):
        # per-frame voxel res 100 matches the reference driver call
        # (train_ft.py:652)
        xyz = np.asarray(dataset.load_init_depth_points(vox_res=100))
    elif opt.load_points == 3 and hasattr(dataset, "load_init_depth_points"):
        # provided cloud + sensor-depth points; depth kept only in voxels the
        # provided cloud leaves empty (reference train_ft.py:649-672: depth at
        # per-frame vox_res=80, occupancy filter at filter_res=100), and the
        # two sources stay separate for the decaying vox_res downsample below
        pts = np.asarray(dataset.load_init_points())
        depth = np.asarray(dataset.load_init_depth_points(vox_res=80))
        depth = filter_depth_by_pc_occupancy(pts, depth, filter_res=100)
        sources = [pts.astype(np.float32), depth.astype(np.float32)]
        xyz = np.concatenate(sources, 0)
    else:
        xyz = np.asarray(dataset.load_init_points())
        import os
        from ..data.ply import read_ply_points
        path = os.path.join(opt.data_root, opt.scan,
                            "colmap_results/dense/fused.ply")
        if os.path.exists(path):
            _, rgb = read_ply_points(path)
            if rgb is not None and len(rgb) != len(xyz):
                rgb = None

    if opt.comb_file:
        # merge an extra txt point cloud (reference: nerf_synth360_ft_dataset
        # load_init_points comb_file branch, :366-371)
        extra = np.loadtxt(opt.comb_file, delimiter=";")
        xyz = np.concatenate([xyz, extra[:, :3].astype(np.float32)], axis=0)
        rgb = None

    ranges = np.asarray(opt.ranges, np.float32)
    if ranges[0] > -99.0:
        crop = lambda p: p[np.all((p >= ranges[:3]) & (p <= ranges[3:]), -1)]
        if sources is not None:
            sources = [crop(p) for p in sources]
            xyz = np.concatenate(sources, 0)
        else:
            keep = np.all((xyz >= ranges[:3]) & (xyz <= ranges[3:]), axis=-1)
            xyz = xyz[keep]
            rgb = rgb[keep] if rgb is not None else None
    if opt.vox_res > 0:
        if sources is not None:
            # per-source decaying resolution (reference train_ft.py:683-695:
            # source i downsampled at vox_res / 1.5^i)
            xyz = np.concatenate(
                [construct_vox_points_closest(p, max(1, int(opt.vox_res / 1.5 ** i)))[0]
                 for i, p in enumerate(sources) if len(p)], 0)
        else:
            xyz, idx = construct_vox_points_closest(xyz, opt.vox_res)
            rgb = rgb[idx] if rgb is not None else None
    if opt.resample_pnts > 0:
        # reference train_ft.py:698-704: 1 = keep only the point nearest the
        # origin (single-point debug), N = random subsample to N points
        if opt.resample_pnts == 1:
            idx = np.argmin(np.linalg.norm(xyz, axis=-1))[None]
        else:
            idx = np.random.RandomState(opt.seed).permutation(
                len(xyz))[: opt.resample_pnts]
        xyz = xyz[idx]
        rgb = rgb[idx] if rgb is not None else None
    return _finish_point_state(opt, dataset, key, xyz, rgb)


def _finish_point_state(opt, dataset, key, xyz: np.ndarray,
                        rgb: Optional[np.ndarray]) -> Dict:
    """Per-point attribute init shared by every load path (reference
    train_ft.py:706-732): nearest-view directions + feature init."""
    n = xyz.shape[0]

    # nearest-view directions (reference: train_ft.py:706-710 nearest_view)
    campos, camdirs = dataset.get_campos_ray()
    d = xyz[:, None, :] - campos[None]                    # [N,V,3]
    nearest = np.argmin(np.linalg.norm(d, axis=-1), axis=-1)
    dirs = d[np.arange(n), nearest]
    dirs = dirs / (np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-6)

    method = opt.feature_init_method
    rng = np.random.RandomState(opt.seed)
    C = opt.point_features_dim
    if opt.point_init_emb_std > 0:
        emb = rng.normal(0, opt.point_init_emb_std, (n, C)).astype(np.float32)
    elif method == "rand":
        emb = rng.uniform(-0.5, 0.5, (n, C)).astype(np.float32)
    elif method == "zeros":
        emb = np.zeros((n, C), np.float32)
    elif method.startswith("gau"):
        emb = rng.normal(0, float(method.split("_")[1]), (n, C)).astype(np.float32)
    else:
        emb = rng.uniform(-0.5, 0.5, (n, C)).astype(np.float32)

    conf_val = opt.default_conf if opt.default_conf > 0 else 0.3
    conf = np.full((n, 1), conf_val, np.float32)
    color = rgb if rgb is not None else np.full((n, 3), 0.5, np.float32)
    return npc.create_point_cloud(xyz, emb, color, dirs.astype(np.float32), conf)


def make_spec_and_grid(opt, state):
    mask = np.asarray(state["mask"])
    xyz = np.asarray(state["xyz"])[mask]
    spec = make_grid_spec(opt, points_min=xyz.min(0), points_max=xyz.max(0),
                          max_points=int(mask.sum()))
    if opt.NN < 0:
        # 8-corner vox-grid query (reference neural_points.py:571): the cloud
        # is a construct_grid_points lattice, whose origin/pitch/extent are
        # recovered from the snapped points themselves — rebuilds stay pure
        # functions of point state across checkpoint/resume
        from ..ops.voxgrid import derive_lattice
        mn, pitch, dims = derive_lattice(xyz)
        spec = dataclasses.replace(
            spec, vox_dim=tuple(int(d) for d in dims),
            vox_space_min=tuple(float(v) for v in mn), vox_gvs=pitch)
    grid = build_grid(state["xyz"], state["mask"], spec)
    return spec, grid


# ----------------------------------------------------------- full-image render
PROBE_KEYS = ("coarse_raycolor", "ray_mask", "ray_max_sample_loc_w",
              "ray_max_far_dist", "ray_max_shading_opacity", "shading_avg_color",
              "shading_avg_dir", "shading_avg_conf", "shading_avg_embedding")


RAY_CHUNK_KEYS = ("raydir", "gt_image", "bg_ray")
CONST_BATCH_KEYS = ("campos", "camrotc2w", "near", "far", "bg_color")


def render_image(ts, grid, opt, spec, item: Dict, prob: bool = False,
                 keys: Tuple[str, ...] = ("coarse_raycolor", "ray_mask"),
                 group: int = 8, stack: bool = True,
                 mesh=None) -> Dict[str, np.ndarray]:
    """Chunked full-image render: scatter ray chunks into [H,W,C] host maps
    (reference: run/train_ft.py:283-322 test / :470-494 probe_hole).

    Chunks are rendered `group` at a time in one jitted dispatch: a
    remote-tunneled chip pays tens of ms of latency per dispatch, and a
    full image is hundreds of chunks. With ``stack`` (the default) the
    group renders as ONE program over group*chunk rays
    (trainer.eval_chunks_stacked) — rays are independent, and one wide
    program tiles the gathers/MLPs far better than `group` serial small
    lax.map bodies (trainer.eval_chunks, ``stack=False``). The tail group
    compiles its own (smaller) program shape instead of padding — two cached
    programs per image size, no wasted chunk renders.

    Multi-chip serving: pass ``mesh`` (a ("batch","rays"[,"points"]) Mesh,
    parallel.make_mesh) and the SAME stacked program runs SPMD — the group's
    chunk axis shards over the ray plane (each chip renders group/|rays|
    chunks) and XLA partitions every per-ray op. `ts`/`grid` keep whatever
    placement the caller gave them: parallel.replicate(...) for pure dp,
    or parallel.points.shard_state/shard_grid for point-sharded tables
    (cross-chip gathers inserted by GSPMD). Requires ``stack`` and the
    world-coord query (the frustum per-camera grid rebuild is single-chip).

    Eval never drops valid shading rows (the reference's compaction is
    dynamic-shape, run/train_ft.py:283-322): a group whose compaction budget
    overflows is re-rendered up a static budget ladder (2x the training
    budget, then compaction off). The ladder position persists for the rest
    of the image, so a scene denser than the training budget costs at most
    two extra group renders — not a doomed compacted pass plus an
    uncompacted retry per group (uncompacted shading is ~6x the compacted
    cost at the bench shapes)."""
    H, W = int(item["h"]), int(item["w"])
    chunk = opt.random_sample_size ** 2
    maps: Dict[str, np.ndarray] = {}
    pix = item["pixel_idx"][0].astype(np.int64)
    overflow = 0
    const_batch = {k: jnp.asarray(item[k]) for k in CONST_BATCH_KEYS
                   if k in item}
    group = max(1, int(group))
    chunk_sharding = None
    if mesh is not None:
        assert stack, "mesh serving shards the stacked wide program"
        assert opt.wcoord_query != 0, \
            "frustum serving is single-chip (per-camera grid rebuild)"
        from jax.sharding import NamedSharding, PartitionSpec as P
        # shard the per-chunk ray axis (dim 2 of the [n,1,C,...] stack) over
        # the ray plane — C is a square of random_sample_size and divides the
        # plane for any pow2 mesh, unlike the tail group's chunk count n;
        # per-camera leaves replicate (they must share the mesh placement or
        # jit rejects the mix)
        plane = int(np.prod([mesh.shape[a] for a in ("batch", "rays")]))
        assert chunk % plane == 0, (chunk, plane)
        if int(getattr(opt, "comp_groups", 1)) == 1 and plane > 1:
            # block the compaction per ray shard of the wide program (the
            # stacked chunk axis shards over the full batch x rays plane) —
            # see Options.comp_groups
            opt = opt.replace(comp_groups=plane)
        chunk_sharding = NamedSharding(mesh, P(None, None, ("batch", "rays")))
        repl = NamedSharding(mesh, P())
        const_batch = {k: (jax.device_put(v, repl) if hasattr(v, "ndim") else v)
                       for k, v in const_batch.items()}

    if opt.wcoord_query == 0 and "xyz_pers" not in grid:
        # frustum serving fast path: build the per-camera perspective grid
        # ONCE and reuse it for every chunk of this image (render_query's
        # prebuilt-grid branch); the reference rebuilds its 30M-voxel grid
        # per query_points call (query_point_indices.py:92-94)
        from ..ops.frustum import build_frustum_grid
        ps = trainer.point_state_of(ts)
        fgrid, xyz_pers = build_frustum_grid(
            ps["xyz"], ps["mask"], jnp.asarray(item["camrotc2w"]),
            jnp.asarray(item["campos"]), spec)
        grid = dict(fgrid, xyz_pers=xyz_pers)

    # budget ladder: training budget -> 2x -> off (each rung is one compiled
    # program, shared by every group and image at that rung)
    from ..models.renderer import effective_sr_budget
    S_chunk = chunk * opt.SR
    rungs = [opt]
    if int(opt.SR_budget) != 0:
        Nc_eff = effective_sr_budget(opt, S_chunk)
        if 0 < 2 * Nc_eff < S_chunk:
            rungs.append(opt.replace(SR_budget=2 * Nc_eff))
        rungs.append(opt.replace(SR_budget=0))
    rung = 0

    def run_group(pending, opt_used):
        stacked = {k: jnp.asarray(np.stack([p[0][k] for p in pending]))
                   for k in RAY_CHUNK_KEYS if k in pending[0][0]}
        if chunk_sharding is not None:
            stacked = {k: jax.device_put(v, chunk_sharding)
                       for k, v in stacked.items()}
        if stack and int(opt_used.SR_budget) != 0 and not prob:
            # the wide program pools the compaction row space: explicit
            # budgets (rung 1's 2x value, or a user-set SR_budget) are
            # per-chunk numbers and scale by the group size; auto (-1)
            # scales with the row space by construction, 0 is off
            if int(opt_used.SR_budget) > 0:
                opt_used = opt_used.replace(
                    SR_budget=int(opt_used.SR_budget) * len(pending))
            return trainer.eval_chunks_stacked(ts, grid, stacked, const_batch,
                                               opt_used, spec, prob=prob)
        # budget-off rung, prob mode, or stack=False: per-chunk lax.map
        # bodies. UNCOMPACTED wide programs at production group shapes do
        # not fit HBM (group 8 x 3600-ray chunks x SR=80: 85.7 GB,
        # scripts/serving_probe.py; the prob render — always uncompacted,
        # renderer.render_query — hit 39.6 GB at the plate campaign via a
        # 16x-padded remat copy of the [1,28800,24,8,42] gather) —
        # chunk-sized uncompacted programs run fine, so these render
        # chunk-at-a-time. Probe renders fire every prob_freq=2000 steps;
        # per-chunk dispatch there is noise.
        return trainer.eval_chunks(ts, grid, stacked, const_batch, opt_used,
                                   spec, prob=prob)

    def drain(inflight):
        """Consume the oldest in-flight group: ladder check + host scatter.

        Dispatches run two groups ahead (the loop below), so the device
        computes group i+1 while the host fetches/scatters group i — jax
        dispatch is async, and the per-group sr_overflow fetch is the only
        forced sync. A group that overflows is re-rendered up the ladder
        immediately (rare; the raised rung persists for later dispatches,
        and already-dispatched groups get the same check when drained)."""
        nonlocal overflow, rung
        pending, outs, rung_used = inflight.popleft()
        while True:
            # ONE batched device→host fetch per group: every per-key /
            # per-chunk np.asarray slice was its own transfer, and through a
            # remote-tunneled chip each costs a full round-trip (~15-25 ms) —
            # 8 chunks x 2+ keys made the host drain ~7x the group's actual
            # compute (measured 523 vs 70.8 ms/group at the campaign shell
            # shapes, scripts/shell_serving_probe.py). device_get issues all
            # copies async then waits once.
            host = jax.device_get(
                {k: outs[k] for k in keys if outs.get(k) is not None}
                | {"sr_overflow": outs.get(
                    "sr_overflow", jnp.zeros((len(pending),), jnp.int32))})
            over = np.asarray(host.pop("sr_overflow"))
            dropped = int(sum(over[: len(pending)]))
            if dropped == 0 or rung_used == len(rungs) - 1:
                break
            overflow += dropped
            rung_used += 1
            rung = max(rung, rung_used)
            outs = run_group(pending, rungs[rung_used])
        for ci, (sub, s, e) in enumerate(pending):
            px, py = pix[s:e, 0], pix[s:e, 1]
            for key, full in host.items():
                arr = np.asarray(full[ci][0], np.float32)
                if arr.ndim == 1:
                    arr = arr[:, None]
                arr = arr[: e - s]
                if key not in maps:
                    maps[key] = np.zeros((H, W, arr.shape[-1]), np.float32)
                maps[key][py, px] = arr

    from collections import deque
    inflight: deque = deque()
    pending = []
    for sub, s, e in chunks_of_item(item, chunk):
        pending.append((sub, s, e))
        if len(pending) == group:
            inflight.append((pending, run_group(pending, rungs[rung]), rung))
            pending = []
            if len(inflight) > 2:
                drain(inflight)
    if pending:
        inflight.append((pending, run_group(pending, rungs[rung]), rung))
    while inflight:
        drain(inflight)
    if overflow > 0:
        # informational only — overflowing groups were re-rendered exactly
        print(f"[render_image] note: SR_budget overflow on {overflow} shading "
              f"rows; groups re-rendered up the budget ladder")
    return maps
