"""Perspective-frustum querier (wcoord_query==0) vs a numpy oracle.

Reference semantics: models/neural_points/query_point_indices.py — per-camera
perspective grid, pixel rays as fixed (x/z, y/z) columns, z-voxel-center
shading points, kernel-neighborhood KNN with xy-radius + z-depth caps,
shpnt_jitter, pers2w.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointnerf_tpu.config import Options
from pointnerf_tpu.ops.camera import w2pers
from pointnerf_tpu.ops.frustum import (build_frustum_grid, make_frustum_spec,
                                       query_frustum_points)


W, H = 16, 16
FX = FY = 20.0
NEAR, FAR = 1.0, 3.0


def frustum_opt(**kw):
    base = dict(
        z_depth_dim=8, vscale=(1, 1, 1), kernel_size=(3, 3, 3),
        query_size=(3, 3, 3), max_o=4096, P=4, K=3, SR=4,
        radius_limit_scale=0.0, depth_limit_scale=0.0,
        shpnt_jitter="passfunc",
    )
    base.update(kw)
    return Options(**base)


def intrinsic():
    return np.array([[FX, 0, W / 2.0], [0, FY, H / 2.0], [0, 0, 1]],
                    np.float32)


def make_scene(n=150, seed=0):
    """Points uniformly inside the frustum; camera at origin, rot=I (+z fwd)."""
    rng = np.random.RandomState(seed)
    px = rng.uniform(0.5, W - 0.5, n)
    py = rng.uniform(0.5, H - 0.5, n)
    z = rng.uniform(NEAR + 0.05, FAR - 0.05, n)
    x = (px - W / 2.0) / FX * z
    y = (py - H / 2.0) / FY * z
    xyz = np.stack([x, y, z], -1).astype(np.float32)
    camrot = np.eye(3, dtype=np.float32)[None]
    campos = np.zeros((1, 3), np.float32)
    return xyz, camrot, campos


def pixel_rays(pixels):
    """[M,2] pixel coords -> [1,M,3] unit world ray dirs (identity camera)."""
    d = np.stack([(pixels[:, 0] + 0.5 - W / 2.0) / FX,
                  (pixels[:, 1] + 0.5 - H / 2.0) / FY,
                  np.ones(len(pixels))], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return d[None].astype(np.float32)


def test_frustum_spec_geometry():
    opt = frustum_opt()
    spec = make_frustum_spec(opt, intrinsic(), W, H, NEAR, FAR)
    # perspective ranges straight from the intrinsics (reference :60-66)
    assert spec.ranges_min == pytest.approx((-W / 2 / FX, -H / 2 / FY, NEAR))
    assert spec.vdim == (W, H, 8)
    assert spec.vsize[0] == pytest.approx(1.0 / FX)
    assert spec.vsize[2] == pytest.approx((FAR - NEAR) / 8)
    assert spec.pers_metric


def test_frustum_query_matches_oracle():
    opt = frustum_opt()
    spec = make_frustum_spec(opt, intrinsic(), W, H, NEAR, FAR)
    xyz, camrot, campos = make_scene()
    n = len(xyz)
    grid, xyz_pers = build_frustum_grid(
        jnp.asarray(xyz), jnp.ones(n, bool), jnp.asarray(camrot),
        jnp.asarray(campos), spec)

    rng = np.random.RandomState(1)
    pixels = rng.randint(0, W, (20, 2)).astype(np.float64)
    raydir = pixel_rays(pixels)
    pidx, loc_w, sdirs, ray_mask, _qo, _comp = query_frustum_points(
        jnp.asarray(raydir), jnp.asarray(camrot), jnp.asarray(campos),
        xyz_pers, grid, spec, SR=opt.SR, K=opt.K)
    pidx = np.asarray(pidx)
    loc_w = np.asarray(loc_w)

    # ---- numpy oracle in perspective space
    pers = np.asarray(xyz_pers)
    mn = np.asarray(spec.ranges_min)
    vs = np.asarray(spec.scaled_vsize)
    vdim = np.asarray(spec.vdim)
    vox = np.floor((pers - mn) / vs).astype(np.int64)
    occ = np.zeros(vdim, bool)
    for v in vox:
        if np.all(v >= 0) and np.all(v < vdim):
            occ[tuple(v)] = True
    # dilate by query_size (3,3,3)
    dil = np.zeros_like(occ)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                src = occ[max(0, -dx):vdim[0] - max(0, dx),
                          max(0, -dy):vdim[1] - max(0, dy),
                          max(0, -dz):vdim[2] - max(0, dz)]
                dil[max(0, dx):vdim[0] - max(0, -dx),
                    max(0, dy):vdim[1] - max(0, -dy),
                    max(0, dz):vdim[2] - max(0, -dz)] |= src

    for r in range(20):
        xp = (pixels[r, 0] + 0.5 - W / 2.0) / FX
        yp = (pixels[r, 1] + 0.5 - H / 2.0) / FY
        cx, cy = int((xp - mn[0]) / vs[0]), int((yp - mn[1]) / vs[1])
        zs = [d for d in range(vdim[2]) if dil[cx, cy, d]][: opt.SR]
        assert bool(ray_mask[0, r]) == (
            len(zs) > 0 and np.any(pidx[0, r] >= 0)) or len(zs) == 0
        for s, zd in enumerate(zs):
            # shading loc = perspective voxel center on the pixel ray
            center = np.array([xp, yp, mn[2] + (zd + 0.5) * vs[2]])
            got_w = loc_w[0, r, s]
            # world loc round-trips through w2pers to the perspective center
            back = np.asarray(w2pers(jnp.asarray(got_w[None, None, None]),
                                     jnp.asarray(camrot),
                                     jnp.asarray(campos)))[0, 0, 0]
            np.testing.assert_allclose(back, center, atol=1e-5)
            # KNN oracle over the kernel neighborhood
            cands = []
            cvox = np.floor((center - mn) / vs).astype(np.int64)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        v = cvox + np.array([dx, dy, dz])
                        if np.any(v < 0) or np.any(v >= vdim):
                            continue
                        idxs = [i for i in range(n)
                                if np.all(vox[i] == v)][: spec.P]
                        cands += idxs
            got = set(int(i) for i in pidx[0, r, s] if i >= 0)
            if not cands:
                assert got == set()
                continue
            cands = np.asarray(sorted(set(cands)))
            d2 = np.sum((pers[cands] - center) ** 2, -1)
            expect = set(cands[np.argsort(d2)[: opt.K]].tolist())
            assert got == expect, (r, s, got, expect)


def test_frustum_depth_limit():
    """z-depth cap excludes same-column points from far z layers
    (reference :476: separate depth_limit2 test on the z axis)."""
    opt = frustum_opt(depth_limit_scale=1.0, kernel_size=(3, 3, 3))
    spec = make_frustum_spec(opt, intrinsic(), W, H, NEAR, FAR)
    assert spec.depth_limit == pytest.approx(spec.vsize[2])
    # two points on the same pixel ray, one z-voxel apart (0.25 world units),
    # third point two voxels away (0.5 > depth_limit 0.25)
    z = np.array([1.375, 1.625, 1.875], np.float32)
    xyz = np.stack([0.1 * z, 0.1 * z, z], -1).astype(np.float32)
    camrot = np.eye(3, dtype=np.float32)[None]
    campos = np.zeros((1, 3), np.float32)
    grid, xyz_pers = build_frustum_grid(
        jnp.asarray(xyz), jnp.ones(3, bool), jnp.asarray(camrot),
        jnp.asarray(campos), spec)
    raydir = np.array([[[0.1, 0.1, 1.0]]], np.float32)
    raydir /= np.linalg.norm(raydir, axis=-1, keepdims=True)
    pidx, _, _, _, _, _ = query_frustum_points(
        jnp.asarray(raydir), jnp.asarray(camrot), jnp.asarray(campos),
        xyz_pers, grid, spec, SR=4, K=3)
    first = set(int(i) for i in np.asarray(pidx)[0, 0, 0] if i >= 0)
    # sample 0 sits at point 0's voxel center: point 1 within one voxel, point
    # 2 at 2 voxels -> excluded by the depth cap
    assert 0 in first and 2 not in first


def test_frustum_jitter_bounds():
    opt = frustum_opt(shpnt_jitter="uniform")
    spec = make_frustum_spec(opt, intrinsic(), W, H, NEAR, FAR)
    xyz, camrot, campos = make_scene()
    grid, xyz_pers = build_frustum_grid(
        jnp.asarray(xyz), jnp.ones(len(xyz), bool), jnp.asarray(camrot),
        jnp.asarray(campos), spec)
    pixels = np.stack([np.arange(10), np.arange(10)], -1).astype(np.float64)
    raydir = pixel_rays(pixels)
    args = (jnp.asarray(raydir), jnp.asarray(camrot), jnp.asarray(campos),
            xyz_pers, grid, spec)
    _, base_w, _, _, _, _ = query_frustum_points(*args, SR=4, K=3)
    _, jit_w, _, _, _, _ = query_frustum_points(
        *args, SR=4, K=3, jitter="uniform", key=jax.random.PRNGKey(3),
        is_train=True)
    base = np.asarray(w2pers(base_w, jnp.asarray(camrot), jnp.asarray(campos)))
    jit = np.asarray(w2pers(jit_w, jnp.asarray(camrot), jnp.asarray(campos)))
    valid = np.isfinite(base[..., 2]) & (np.abs(base[..., 2]) > 1e-3) \
        & (np.abs(jit[..., 2]) > 1e-3)
    dz = np.abs(jit[..., 2] - base[..., 2])[valid]
    assert dz.max() <= spec.vsize[2] / 2 + 1e-5
    assert dz.max() > 1e-6  # it actually jittered
    # xy perspective coords untouched (z-only jitter, reference :104-116)
    np.testing.assert_allclose(jit[..., :2][valid], base[..., :2][valid],
                               atol=1e-5)


def test_render_forward_frustum_mode():
    """renderer integration: wcoord_query==0 renders finite colors and
    produces grads for the aggregator."""
    from pointnerf_tpu.models import neural_points as npc
    from pointnerf_tpu.models.aggregator import init_aggregator_params
    from pointnerf_tpu.models.renderer import render_forward

    opt = frustum_opt(
        wcoord_query=0, point_features_dim=8, shading_feature_num=16,
        shading_feature_mlp_layer1=1, shading_feature_mlp_layer3=1,
        num_feat_freqs=0, dist_xyz_freq=2, agg_intrp_order=2,
        num_viewdir_freqs=2, z_depth_dim=8, SR=4, K=3,
        which_ray_generation="near_far_linear",
        near_plane=NEAR, far_plane=FAR,
    )
    spec = make_frustum_spec(opt, intrinsic(), W, H, NEAR, FAR)
    xyz, camrot, campos = make_scene(n=200)
    rng = np.random.RandomState(2)
    state = npc.create_point_cloud(
        xyz, rng.rand(200, 8).astype(np.float32) - 0.5,
        color=rng.rand(200, 3).astype(np.float32),
        direction=np.tile(np.array([0, 0, 1], np.float32), (200, 1)),
        conf=np.ones((200, 1), np.float32))
    pixels = rng.randint(0, W, (24, 2)).astype(np.float64)
    batch = {
        "raydir": jnp.asarray(pixel_rays(pixels)),
        "campos": jnp.asarray(campos),
        "camrotc2w": jnp.asarray(camrot),
        "near": NEAR, "far": FAR,
        "bg_color": jnp.ones((1, 3), jnp.float32),
    }
    params = init_aggregator_params(jax.random.PRNGKey(0), opt)

    def f(p):
        out = render_forward(p, state, None, spec, opt, batch,
                             jax.random.PRNGKey(1), is_train=True)
        return jnp.sum(out["coarse_raycolor"]), out

    (val, out), grads = jax.value_and_grad(f, has_aux=True)(params)
    assert np.isfinite(float(val))
    assert np.asarray(out["coarse_raycolor"]).shape == (1, 24, 3)
    assert bool(np.any(np.asarray(out["ray_mask"])))
    gsum = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0


def test_frustum_prebuilt_grid_fast_path_exact():
    """The serving fast path (grid built once per camera, reused across
    chunks — render_query's prebuilt branch) must reproduce the per-call
    rebuild exactly."""
    from pointnerf_tpu.models import neural_points as npc
    from pointnerf_tpu.models.aggregator import init_aggregator_params
    from pointnerf_tpu.models.renderer import render_forward
    from pointnerf_tpu.ops.frustum import build_frustum_grid

    opt = frustum_opt(
        wcoord_query=0, point_features_dim=8, shading_feature_num=16,
        shading_feature_mlp_layer1=1, shading_feature_mlp_layer3=1,
        num_feat_freqs=0, dist_xyz_freq=2, agg_intrp_order=2,
        num_viewdir_freqs=2, z_depth_dim=8, SR=4, K=3,
        which_ray_generation="near_far_linear",
        near_plane=NEAR, far_plane=FAR,
    )
    spec = make_frustum_spec(opt, intrinsic(), W, H, NEAR, FAR)
    xyz, camrot, campos = make_scene(n=150)
    rng = np.random.RandomState(5)
    state = npc.create_point_cloud(
        xyz, rng.rand(150, 8).astype(np.float32) - 0.5,
        color=rng.rand(150, 3).astype(np.float32),
        direction=np.tile(np.array([0, 0, 1], np.float32), (150, 1)),
        conf=np.ones((150, 1), np.float32))
    pixels = rng.randint(0, W, (16, 2)).astype(np.float64)
    batch = {
        "raydir": jnp.asarray(pixel_rays(pixels)),
        "campos": jnp.asarray(campos),
        "camrotc2w": jnp.asarray(camrot),
        "near": NEAR, "far": FAR,
        "bg_color": jnp.ones((1, 3), jnp.float32),
    }
    params = init_aggregator_params(jax.random.PRNGKey(0), opt)

    out_rebuild = render_forward(params, state, None, spec, opt, batch,
                                 key=None, is_train=False)
    fgrid, xyz_pers = build_frustum_grid(
        state["xyz"], state["mask"], batch["camrotc2w"], batch["campos"],
        spec)
    out_fast = render_forward(params, state, dict(fgrid, xyz_pers=xyz_pers),
                              spec, opt, batch, key=None, is_train=False)
    np.testing.assert_array_equal(np.asarray(out_fast["coarse_raycolor"]),
                                  np.asarray(out_rebuild["coarse_raycolor"]))
    np.testing.assert_array_equal(np.asarray(out_fast["ray_mask"]),
                                  np.asarray(out_rebuild["ray_mask"]))


def test_frustum_inverse_depth_bucketing():
    """--inverse 1: z buckets in disparity (reference query_point_indices
    get_hyperparameters / coor_z = (1/z - 1/far)/vsize); shading centers are
    uniform in 1/z, walk near-to-far, and the KNN matches a numpy oracle
    over the disparity-bucketed kernel window with TRUE-z distances."""
    opt = frustum_opt(inverse=1, K=4)
    spec = make_frustum_spec(opt, intrinsic(), W, H, NEAR, FAR)
    assert spec.inv_z
    assert spec.ranges_min[2] == pytest.approx(1.0 / FAR)
    assert spec.vsize[2] == pytest.approx((1 / NEAR - 1 / FAR) / 8)

    xyz, camrot, campos = make_scene(n=180, seed=3)
    n = len(xyz)
    grid, xyz_pers = build_frustum_grid(
        jnp.asarray(xyz), jnp.ones(n, bool), jnp.asarray(camrot),
        jnp.asarray(campos), spec)
    assert int(grid["num_occ"]) > 0

    rng = np.random.RandomState(4)
    pixels = rng.randint(0, W, (16, 2)).astype(np.float64)
    raydir = pixel_rays(pixels)
    pidx, loc_w, sdirs, ray_mask, _qo, _comp = query_frustum_points(
        jnp.asarray(raydir), jnp.asarray(camrot), jnp.asarray(campos),
        xyz_pers, grid, spec, SR=opt.SR, K=opt.K)
    pidx, loc_w = np.asarray(pidx), np.asarray(loc_w)

    pers = np.asarray(xyz_pers)
    mn = np.asarray(spec.ranges_min)
    vs = np.asarray(spec.scaled_vsize)
    vdim = np.asarray(spec.vdim)

    def bucket(p):  # disparity z-bucketing
        t = np.array([p[0], p[1], 1.0 / p[2]])
        return np.floor((t - mn) / vs).astype(np.int64)

    vox = np.stack([bucket(p) for p in pers])
    occ = np.zeros(vdim, bool)
    for v in vox:
        if np.all(v >= 0) and np.all(v < vdim):
            occ[tuple(v)] = True
    dil = np.zeros_like(occ)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                src = occ[max(0, -dx):vdim[0] - max(0, dx),
                          max(0, -dy):vdim[1] - max(0, dy),
                          max(0, -dz):vdim[2] - max(0, dz)]
                dil[max(0, dx):vdim[0] - max(0, -dx),
                    max(0, dy):vdim[1] - max(0, -dy),
                    max(0, dz):vdim[2] - max(0, -dz)] |= src

    hits = 0
    for r in range(16):
        xp = (pixels[r, 0] + 0.5 - W / 2.0) / FX
        yp = (pixels[r, 1] + 0.5 - H / 2.0) / FY
        cx, cy = int((xp - mn[0]) / vs[0]), int((yp - mn[1]) / vs[1])
        # centers walk DESCENDING disparity (ascending true z)
        zds = [d for d in range(vdim[2] - 1, -1, -1) if dil[cx, cy, d]]
        zs_true = [1.0 / (mn[2] + (zd + 0.5) * vs[2]) for zd in zds][: opt.SR]
        # returned shading z ascends and matches the disparity centers
        got_z = [loc_w[0, r, s, 2] for s in range(len(zs_true))]
        np.testing.assert_allclose(got_z, zs_true, rtol=1e-5)
        assert got_z == sorted(got_z)
        for s, zt in enumerate(zs_true):
            center = np.array([xp, yp, zt])
            cands = []
            cvox = bucket(center)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        v = cvox + np.array([dx, dy, dz])
                        if np.any(v < 0) or np.any(v >= vdim):
                            continue
                        cands += [i for i in range(n)
                                  if np.all(vox[i] == v)]
            if not cands:
                continue
            hits += 1
            d2 = {i: np.sum((pers[i] - center) ** 2) for i in cands}
            want = set(sorted(d2, key=d2.get)[: opt.K])
            got = set(int(i) for i in pidx[0, r, s] if i >= 0)
            # P=4 bucket truncation can drop candidates; require the kept
            # neighbors to be a subset of the oracle's candidate set and the
            # top-1 nearest to be present when its bucket kept it
            assert got <= set(cands)
            top1 = min(d2, key=d2.get)
            kept = set(np.asarray(
                grid["occ_2_xyz"].reshape(-1, 4)[:, 3]).astype(int))
            if top1 in kept:
                assert top1 in got or len(got) == opt.K
    assert hits > 5


def test_frustum_superset_matches_exact():
    """frustum_superset_P (serving fast path): with capacity >= every
    neighborhood's candidate count, the superset query must return the same
    neighbor sets as the exact 27-tile scan — including the pers-metric
    depth cap, which the superset KNN applies blockwise."""
    xyz, camrot, campos = make_scene(n=200, seed=3)
    rng = np.random.RandomState(5)
    pixels = rng.randint(0, W, (40, 2)).astype(np.float64)
    raydir = pixel_rays(pixels)

    outs = {}
    for p2 in (0, 128):
        opt = frustum_opt(frustum_superset_P=p2, depth_limit_scale=1.5)
        spec = make_frustum_spec(opt, intrinsic(), W, H, NEAR, FAR)
        assert spec.superset_P == p2
        grid, xyz_pers = build_frustum_grid(
            jnp.asarray(xyz), jnp.ones(len(xyz), bool), jnp.asarray(camrot),
            jnp.asarray(campos), spec)
        pidx, loc_w, _, ray_mask, _qo, _comp = query_frustum_points(
            jnp.asarray(raydir), jnp.asarray(camrot), jnp.asarray(campos),
            xyz_pers, grid, spec, SR=opt.SR, K=opt.K)
        outs[p2] = (np.asarray(pidx), np.asarray(loc_w), np.asarray(ray_mask))

    pid_e, loc_e, rm_e = outs[0]
    pid_s, loc_s, rm_s = outs[128]
    np.testing.assert_array_equal(rm_e, rm_s)
    np.testing.assert_allclose(loc_e, loc_s, atol=1e-6)
    # samples in OCCUPIED voxels must agree exactly — adoption only shifts
    # the candidate window of empty-but-dilated voxels (same contract as the
    # world-coord superset, test_grid_query.py superset tests). Occupancy
    # test in perspective space on the shading locations.
    spec = make_frustum_spec(frustum_opt(), intrinsic(), W, H, NEAR, FAR)
    mn = np.asarray(spec.ranges_min)
    vs = np.asarray(spec.scaled_vsize)
    vdim = np.asarray(spec.vdim)
    pers = np.asarray(w2pers(jnp.asarray(xyz[None]), jnp.asarray(camrot),
                             jnp.asarray(campos)))[0]
    occ = set()
    for v in np.floor((pers - mn) / vs).astype(np.int64):
        if np.all(v >= 0) and np.all(v < vdim):
            occ.add(tuple(v))
    loc_pers = np.asarray(w2pers(
        jnp.asarray(loc_e.reshape(1, -1, 3)), jnp.asarray(camrot),
        jnp.asarray(campos)))[0]
    sample_vox = np.floor((loc_pers - mn) / vs).astype(np.int64)
    n_occ = n_occ_same = 0
    for v, a, b in zip(sample_vox, pid_e.reshape(-1, pid_e.shape[-1]),
                       pid_s.reshape(-1, pid_s.shape[-1])):
        if (a < 0).all() or tuple(v) not in occ:
            continue
        n_occ += 1
        n_occ_same += set(a.tolist()) == set(b.tolist())
    assert n_occ > 10
    assert n_occ_same == n_occ, (n_occ_same, n_occ)
    assert (pid_e >= 0).any()


def test_frustum_superset_inverse_mode_stays_exact():
    """inv_z forces the superset off (disparity-space centers)."""
    opt = frustum_opt(frustum_superset_P=64, inverse=1)
    spec = make_frustum_spec(opt, intrinsic(), W, H, NEAR, FAR)
    assert spec.superset_P == 0 and spec.inv_z


def test_frustum_compaction_matches_uncompacted():
    """Nc covering all valid rows: the compacted query's (comp_src, c_pidx)
    must reproduce exactly the uncompacted sample_pidx at the mapped rows,
    with identical ray_mask and zero overflow (round-4 pre-KNN SR_budget
    compaction on the frustum path)."""
    opt = frustum_opt()
    spec = make_frustum_spec(opt, intrinsic(), W, H, NEAR, FAR)
    xyz, camrot, campos = make_scene()
    n = len(xyz)
    grid, xyz_pers = build_frustum_grid(
        jnp.asarray(xyz), jnp.ones(n, bool), jnp.asarray(camrot),
        jnp.asarray(campos), spec)
    rng = np.random.RandomState(3)
    pixels = rng.randint(0, W, (24, 2)).astype(np.float64)
    raydir = jnp.asarray(pixel_rays(pixels))
    args = (raydir, jnp.asarray(camrot), jnp.asarray(campos), xyz_pers, grid,
            spec)
    R, SR = raydir.shape[1], opt.SR
    full_pidx, full_w, _, full_mask, qo0, comp0 = query_frustum_points(
        *args, SR=SR, K=opt.K)
    assert comp0 is None and int(qo0) == 0
    Nc = R * SR - 1  # < S engages compaction; still covers every valid row
    cpidx, c_w, _, c_mask, qo, comp = query_frustum_points(
        *args, SR=SR, K=opt.K, Nc=Nc)
    assert cpidx is None and int(qo) == 0
    comp_src, comp_valid, c_pidx, row_valid, counts = (
        np.asarray(x) for x in comp)
    fp = np.asarray(full_pidx).reshape(R * SR, opt.K)
    has = (fp >= 0).any(-1).reshape(R, SR)
    np.testing.assert_array_equal(np.asarray(c_mask), np.asarray(full_mask))
    np.testing.assert_array_equal(row_valid[0], has)
    # counts are the per-ray prefix-form slot counts the compaction packed
    np.testing.assert_array_equal(counts[0], has.sum(-1))
    for s in range(comp_src.shape[1]):
        if not comp_valid[0, s]:
            continue
        np.testing.assert_array_equal(c_pidx[0, s], fp[comp_src[0, s]],
                                      err_msg=f"slot {s}")
    # world locations identical (compaction never touches them)
    np.testing.assert_allclose(np.asarray(c_w), np.asarray(full_w),
                               rtol=1e-6, atol=1e-6)


def test_frustum_rand_mode_nn0():
    """NN<=0 random-sample sub-mode (reference query_rand_along_ray,
    query_point_indices.py:414-491): K neighbors sampled uniformly without
    replacement from the cap-valid kernel-window candidates — the
    distribution of the reference's first-K + curand reservoir replacement.
    """
    opt = frustum_opt(NN=0, wcoord_query=0)
    spec = make_frustum_spec(opt, intrinsic(), W, H, NEAR, FAR)
    xyz, camrot, campos = make_scene(n=220, seed=3)
    n = len(xyz)
    grid, xyz_pers = build_frustum_grid(
        jnp.asarray(xyz), jnp.ones(n, bool), jnp.asarray(camrot),
        jnp.asarray(campos), spec)

    rng = np.random.RandomState(2)
    pixels = rng.randint(0, W, (16, 2)).astype(np.float64)
    raydir = pixel_rays(pixels)

    def run(seed):
        pidx, loc_w, _sd, ray_mask, _qo, _comp = query_frustum_points(
            jnp.asarray(raydir), jnp.asarray(camrot), jnp.asarray(campos),
            xyz_pers, grid, spec, SR=opt.SR, K=opt.K,
            key=jax.random.PRNGKey(seed), rand_mode=True)
        return np.asarray(pidx), np.asarray(loc_w), np.asarray(ray_mask)

    pidx0, loc_w, ray_mask = run(0)

    # oracle candidate sets (same voxelization as the exact-KNN oracle)
    pers = np.asarray(xyz_pers)
    mn = np.asarray(spec.ranges_min)
    vs = np.asarray(spec.scaled_vsize)
    vdim = np.asarray(spec.vdim)
    vox = np.floor((pers - mn) / vs).astype(np.int64)

    def cand_set(center):
        cvox = np.floor((center - mn) / vs).astype(np.int64)
        cands = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    v = cvox + np.array([dx, dy, dz])
                    if np.any(v < 0) or np.any(v >= vdim):
                        continue
                    cands += [i for i in range(n)
                              if np.all(vox[i] == v)][: spec.P]
        return set(cands)

    from pointnerf_tpu.ops.camera import w2pers as _w2p
    n_multi = 0          # rows with more candidates than K
    union_runs = {}      # row -> set of indices seen across seeds
    rows = []
    for r in range(16):
        for s in range(opt.SR):
            got = [int(i) for i in pidx0[0, r, s] if i >= 0]
            if not got:
                continue
            center = np.asarray(_w2p(
                jnp.asarray(loc_w[0, r, s][None, None, None]),
                jnp.asarray(camrot), jnp.asarray(campos)))[0, 0, 0]
            cands = cand_set(center)
            # 1. membership: every returned neighbor is a window candidate
            assert set(got) <= cands, (r, s, set(got) - cands)
            # 2. no duplicates within a row
            assert len(got) == len(set(got))
            # 3. <=K candidates -> ALL are returned (reference keeps first K)
            if len(cands) <= opt.K:
                assert set(got) == cands
            else:
                n_multi += 1
                rows.append((r, s, cands))
    assert n_multi > 0, "scene too sparse to exercise the random pick"

    # 4. randomness + coverage: across seeds, oversubscribed rows vary and
    #    every candidate is eventually picked (uniform support)
    varied = 0
    for seed in range(1, 8):
        pidx_k, _, _ = run(seed)
        for (r, s, cands) in rows:
            got = frozenset(int(i) for i in pidx_k[0, r, s] if i >= 0)
            union_runs.setdefault((r, s), set()).update(got)
            if got != frozenset(int(i) for i in pidx0[0, r, s] if i >= 0):
                varied += 1
    assert varied > 0, "selections identical across keys — not random"
    for (r, s, cands) in rows:
        assert union_runs[(r, s)] <= cands

    # 5. determinism: same key -> same result
    pidx0b, _, _ = run(0)
    np.testing.assert_array_equal(pidx0, pidx0b)


def test_nn0_config_validation():
    """--NN 0 parses on the frustum path and is rejected elsewhere (the
    reference's worldcoords module declares query_rand_along_ray but never
    defines it — query_point_indices_worldcoords.py:530)."""
    from pointnerf_tpu.config import validate_options
    validate_options(frustum_opt(NN=0, wcoord_query=0))
    with pytest.raises(ValueError, match="frustum"):
        validate_options(frustum_opt(NN=0, wcoord_query=1))
