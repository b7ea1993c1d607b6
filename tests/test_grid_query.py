"""Grid build + neighbor query vs a numpy brute-force oracle (SURVEY.md §7.2 phase 2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pointnerf_tpu.config import Options
from pointnerf_tpu.ops.grid import (make_grid_spec, build_grid, GridSpec,
                                    grid_debug_tables)
from pointnerf_tpu.ops.query import (mask_raypos, select_shading_points,
                                     knn_neighbors, query_grid_points)


def small_opt(**kw):
    base = dict(
        vsize=(0.1, 0.1, 0.1), vscale=(1, 1, 1), kernel_size=(3, 3, 3),
        query_size=(3, 3, 3), ranges=(0.0, 0.0, 0.0, 1.0, 1.0, 1.0),
        max_o=256, P=4, K=3, SR=4, radius_limit_scale=0.0,
    )
    base.update(kw)
    return Options(**base)


def brute_voxel(xyz, spec):
    mn = np.asarray(spec.ranges_min)
    vs = np.asarray(spec.scaled_vsize)
    return np.floor((xyz - mn) / vs).astype(np.int64)


def test_grid_build_buckets():
    opt = small_opt()
    xyz = np.array([
        [0.05, 0.05, 0.05],   # voxel of its own
        [0.05, 0.05, 0.06],   # same voxel
        [0.55, 0.55, 0.55],   # distant voxel
        [5.0, 5.0, 5.0],      # out of range
    ], dtype=np.float32)
    spec = make_grid_spec(opt, points_min=xyz[:3].min(0), points_max=xyz[:3].max(0),
                          max_points=4)
    grid = build_grid(jnp.asarray(xyz), jnp.ones(4, bool), spec)
    assert int(grid["num_occ"]) == 2
    c2o = np.asarray(grid["coor_2_occ"])
    occupied_slots = sorted(set(c2o[c2o >= 0].tolist()))
    assert occupied_slots == [0, 1]
    o2p = grid_debug_tables(grid, spec)["occ_2_pnts"]
    buckets = [sorted(x for x in o2p[s] if x >= 0) for s in occupied_slots]
    assert sorted(map(tuple, buckets)) == [(0, 1), (2,)]
    npnts = grid_debug_tables(grid, spec)["occ_numpnts"]
    assert sorted(npnts[npnts > 0].tolist()) == [1, 2]


def test_grid_bucket_overflow_deterministic():
    opt = small_opt(P=2)
    xyz = np.full((5, 3), 0.05, dtype=np.float32)
    spec = make_grid_spec(opt, points_min=xyz.min(0), points_max=xyz.max(0),
                          max_points=5)
    g1 = build_grid(jnp.asarray(xyz), jnp.ones(5, bool), spec)
    g2 = build_grid(jnp.asarray(xyz), jnp.ones(5, bool), spec)
    t1 = grid_debug_tables(g1, spec)
    t2 = grid_debug_tables(g2, spec)
    np.testing.assert_array_equal(t1["occ_2_pnts"], t2["occ_2_pnts"])
    bucket = t1["occ_2_pnts"][0]
    assert (bucket >= 0).sum() == 2
    assert int(t1["occ_numpnts"][0]) == 2


def test_point_mask_excludes_points():
    opt = small_opt()
    xyz = np.array([[0.05, 0.05, 0.05], [0.55, 0.55, 0.55]], dtype=np.float32)
    spec = make_grid_spec(opt, max_points=2)
    grid = build_grid(jnp.asarray(xyz), jnp.array([True, False]), spec)
    assert int(grid["num_occ"]) == 1
    o2p = grid_debug_tables(grid, spec)["occ_2_pnts"]
    assert set(o2p[o2p >= 0].tolist()) == {0}


def test_dilated_occupancy():
    opt = small_opt(query_size=(3, 3, 3))
    xyz = np.array([[0.55, 0.55, 0.55]], dtype=np.float32)
    spec = make_grid_spec(opt, max_points=1)
    grid = build_grid(jnp.asarray(xyz), jnp.ones(1, bool), spec)
    occ = grid_debug_tables(grid, spec)["coor_occ"].reshape(spec.vdim)
    center = brute_voxel(xyz, spec)[0]
    # all 27 neighbors occupied, two steps away not
    for d in [(-1, 0, 0), (1, 1, 1), (0, -1, 1)]:
        assert occ[tuple(center + d)] == 1
    assert occ[tuple(center + np.array([2, 0, 0]))] == 0
    assert occ.sum() == 27


def test_shading_point_selection():
    # 1 ray, 6 depth samples, valid pattern 0,1,1,0,1,1 with SR=3 keeps first 3 valid
    raypos = np.arange(18, dtype=np.float32).reshape(1, 1, 6, 3)
    valid = jnp.array([[[False, True, True, False, True, True]]])
    loc, mask = select_shading_points(jnp.asarray(raypos), valid, 3)
    assert mask.shape == (1, 1, 3)
    assert bool(jnp.all(mask))
    np.testing.assert_array_equal(np.asarray(loc[0, 0]),
                                  raypos[0, 0, [1, 2, 4]])


def test_knn_matches_bruteforce():
    rng = np.random.RandomState(0)
    opt = small_opt(K=4, P=8, radius_limit_scale=0.0)
    xyz = rng.uniform(0.2, 0.8, size=(200, 3)).astype(np.float32)
    spec = make_grid_spec(opt, points_min=xyz.min(0), points_max=xyz.max(0),
                          max_points=200)
    grid = build_grid(jnp.asarray(xyz), jnp.ones(200, bool), spec)
    # shading points at random locations
    loc = rng.uniform(0.3, 0.7, size=(1, 2, 3, 3)).astype(np.float32)
    mask = jnp.ones((1, 2, 3), bool)
    pidx = np.asarray(knn_neighbors(jnp.asarray(loc), mask, jnp.asarray(xyz),
                                    grid, spec, 4))
    # oracle: KNN restricted to candidate set = buckets of the 27 neighboring voxels
    o2p = grid_debug_tables(grid, spec)["occ_2_pnts"]
    c2o = np.asarray(grid["coor_2_occ"]).reshape(spec.vdim)
    for b in range(1):
        for r in range(2):
            for s in range(3):
                center = brute_voxel(loc[b, r, s], spec)
                cands = []
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        for dz in (-1, 0, 1):
                            v = center + np.array([dx, dy, dz])
                            if np.any(v < 0) or np.any(v >= np.array(spec.vdim)):
                                continue
                            slot = c2o[tuple(v)]
                            if slot >= 0:
                                cands += [p for p in o2p[slot] if p >= 0]
                cands = np.array(sorted(set(cands)))
                got = set(int(i) for i in pidx[b, r, s] if i >= 0)
                if len(cands) == 0:
                    assert got == set()
                    continue
                d2 = np.sum((xyz[cands] - loc[b, r, s]) ** 2, axis=-1)
                expect = set(cands[np.argsort(d2)[:4]].tolist())
                assert got == expect, (got, expect)


def test_knn_radius_limit():
    opt = small_opt(K=3, radius_limit_scale=0.5)  # radius = 0.05
    xyz = np.array([[0.50, 0.50, 0.50], [0.52, 0.50, 0.50], [0.58, 0.50, 0.50]],
                   dtype=np.float32)
    spec = make_grid_spec(opt, points_min=xyz.min(0), points_max=xyz.max(0),
                          max_points=3)
    assert spec.radius_limit == pytest.approx(0.05)
    grid = build_grid(jnp.asarray(xyz), jnp.ones(3, bool), spec)
    loc = jnp.asarray(np.array([[[[0.50, 0.50, 0.50]]]], dtype=np.float32))
    pidx = np.asarray(knn_neighbors(loc, jnp.ones((1, 1, 1), bool),
                                    jnp.asarray(xyz), grid, spec, 3))[0, 0, 0]
    got = set(int(i) for i in pidx if i >= 0)
    assert got == {0, 1}  # point 2 is 0.08 away > 0.05 radius


def test_full_query_ray_mask():
    opt = small_opt(SR=4, K=2)
    xyz = np.array([[0.5, 0.5, 0.5]], dtype=np.float32)
    spec = make_grid_spec(opt, points_min=xyz.min(0), points_max=xyz.max(0),
                          max_points=1)
    grid = build_grid(jnp.asarray(xyz), jnp.ones(1, bool), spec)
    # ray 0 passes through the point; ray 1 far away. The query is
    # t-parameterized (raypos = campos + raydir·t); rays with different
    # origins go in as separate batch rows.
    D = 16
    t = np.linspace(0.0, 1.0, D, dtype=np.float32)
    campos = jnp.asarray(np.array([[0.5, 0.5, 0.0], [5.0, 5.0, 0.0]],
                                  np.float32))               # [2,3]
    raydir = jnp.asarray(np.tile(np.array([[[0.0, 0.0, 1.0]]], np.float32),
                                 (2, 1, 1)))                 # [2,1,3]
    tvals = jnp.asarray(np.tile(t[None, None], (2, 1, 1)))   # [2,1,D]
    pidx, loc, ray_mask, _qo, _comp, _oo = query_grid_points(
        campos, raydir, tvals, jnp.asarray(xyz), grid, spec, SR=4, K=2)
    pidx = pidx.reshape(1, 2, 4, 2)
    ray_mask = ray_mask.reshape(1, 2)
    assert pidx.shape == (1, 2, 4, 2)
    rm = np.asarray(ray_mask)
    assert rm[0, 0] and not rm[0, 1]
    assert np.any(np.asarray(pidx)[0, 0] == 0)
    assert np.all(np.asarray(pidx)[0, 1] == -1)


def test_superset_query_matches_direct_when_capacity_suffices():
    """With superset_P >= all neighborhood candidates and samples in occupied
    voxels, the superset path must pick the same neighbor sets as the direct
    27-tile query."""
    import numpy as np
    import jax.numpy as jnp
    from pointnerf_tpu.config import Options
    from pointnerf_tpu.ops.grid import make_grid_spec, build_grid
    from pointnerf_tpu.ops import query as Q

    rng = np.random.RandomState(0)
    n = 600
    xyz = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    opt = Options(vsize=(0.1, 0.1, 0.1), vscale=(1, 1, 1),
                  kernel_size=(3, 3, 3), query_size=(3, 3, 3),
                  max_o=4096, P=16, K=4, radius_limit_scale=4.0,
                  query_max_voxels=0)
    spec_d = make_grid_spec(opt, xyz.min(0), xyz.max(0), n)
    spec_s = make_grid_spec(opt.replace(superset_P=256), xyz.min(0),
                            xyz.max(0), n)
    mask = jnp.ones((n,), bool)
    xyz_j = jnp.asarray(xyz)
    grid_d = build_grid(xyz_j, mask, spec_d)
    grid_s = build_grid(xyz_j, mask, spec_s)

    # shading samples AT point positions (guaranteed occupied voxels)
    sl = jnp.asarray(xyz[:128].reshape(1, 16, 8, 3))
    sm = jnp.ones((1, 16, 8), bool)
    pid_d = np.asarray(Q.knn_neighbors(sl, sm, xyz_j, grid_d, spec_d, 4))
    pid_s = np.asarray(Q.knn_neighbors_superset(sl, sm, grid_s, spec_s, 4))
    # compare as sets per sample (tie order may differ)
    same = 0
    total = 0
    for a, b in zip(pid_d.reshape(-1, 4), pid_s.reshape(-1, 4)):
        total += 1
        same += set(a.tolist()) == set(b.tolist())
    assert same / total > 0.99, same / total


def test_superset_build_shapes():
    import numpy as np
    import jax.numpy as jnp
    from pointnerf_tpu.config import Options
    from pointnerf_tpu.ops.grid import make_grid_spec, build_grid

    rng = np.random.RandomState(1)
    xyz = rng.uniform(-0.4, 0.4, (500, 3)).astype(np.float32)
    opt = Options(vsize=(0.1, 0.1, 0.1), vscale=(1, 1, 1),
                  kernel_size=(3, 3, 3), query_size=(3, 3, 3),
                  max_o=1024, P=8, superset_P=32)
    spec = make_grid_spec(opt, xyz.min(0), xyz.max(0), 500)
    grid = build_grid(jnp.asarray(xyz), jnp.ones((500,), bool), spec)
    # SoA row layout [x*P2 | y*P2 | z*P2 | idx*P2] (full-tile lane width)
    assert grid["super_xyz"].shape == (1024, 4 * 32)
    assert grid["coor_slot"].shape == (spec.grid_size_vol,)
    # every dilated-occupied voxel maps to a valid slot
    cs = np.asarray(grid["coor_slot"])
    co = grid_debug_tables(grid, spec)["coor_occ"]
    assert ((cs >= 0) == (co > 0)).all()
    # superset rows hold real candidates: idx channel within range or padding
    sx = np.asarray(grid["super_xyz"]).reshape(1024, 4, 32)
    idx = sx[:, 3]
    real = sx[:, 0] < 1e7
    assert ((idx[real] >= 0) & (idx[real] < 500)).all()


def test_superset_adoption_above_surface():
    """A sample in an empty-but-dilated voxel above a surface must adopt the
    occupied voxel directly beneath it (nearest), not an arbitrary window
    neighbor — a diagonal adoption loses the points right below the sample
    (measured 42% wrong neighbor sets before the distance-ordered fix)."""
    # superset_P=48 >= the 36 in-window candidates: isolates ADOPTION
    # (capacity truncation is measured separately, scripts/measure_superset.py)
    opt = small_opt(K=4, P=8, superset_P=48, radius_limit_scale=0.0)
    # plane of points at z=0.45 (voxel layer z=4), dense in x-y
    g = np.linspace(0.05, 0.95, 19, dtype=np.float32)
    gx, gy = np.meshgrid(g, g, indexing="ij")
    xyz = np.stack([gx, gy, np.full_like(gx, 0.45)], -1).reshape(-1, 3)
    n = len(xyz)
    spec = make_grid_spec(opt, points_min=xyz.min(0), points_max=xyz.max(0),
                          max_points=n)
    grid = build_grid(jnp.asarray(xyz), jnp.ones(n, bool), spec)
    from pointnerf_tpu.ops.query import knn_neighbors_superset

    # samples one voxel ABOVE the plane (empty, dilated by query_size 3)
    rng = np.random.RandomState(3)
    sx = rng.uniform(0.2, 0.8, 32).astype(np.float32)
    sy = rng.uniform(0.2, 0.8, 32).astype(np.float32)
    loc = np.stack([sx, sy, np.full_like(sx, 0.55)], -1).reshape(1, 32, 1, 3)
    mask = jnp.ones((1, 32, 1), bool)
    got = np.asarray(knn_neighbors_superset(jnp.asarray(loc), mask, grid,
                                            spec, opt.K))
    exact = np.asarray(knn_neighbors(jnp.asarray(loc), mask,
                                     jnp.asarray(xyz), grid, spec, opt.K))
    for r in range(32):
        e = set(int(i) for i in exact[0, r, 0] if i >= 0)
        s = set(int(i) for i in got[0, r, 0] if i >= 0)
        assert e, r  # dilation must make these samples valid
        assert s == e, (r, s, e)


def test_select_shading_t_blocked_matches_unblocked(monkeypatch):
    """The SR-blocked selection (big-program memory guard) must equal the
    single-block formulation bit-for-bit."""
    import jax.numpy as jnp
    from pointnerf_tpu.ops import query as Q

    rng = np.random.RandomState(0)
    B, R, D, SR = 2, 13, 40, 7
    valid = jnp.asarray(rng.rand(B, R, D) < 0.3)
    tvals = jnp.asarray(np.sort(rng.rand(B, R, D).astype(np.float32), -1))
    t1, m1, c1 = Q.select_shading_t(tvals, valid, SR)
    monkeypatch.setattr(Q, "_SELECT_BLOCK_LIMIT", 64)  # force blocking
    t2, m2, c2 = Q.select_shading_t(tvals, valid, SR)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_expand_compacted_matches_scatter_and_vjp():
    """expand_compacted (closed-form rank gather) must equal the scatter-back
    of compacted rows it replaces, in BOTH flat and grouped gather forms, and
    its custom VJP must equal autodiff of the scatter formulation."""
    import jax
    import jax.numpy as jnp
    from pointnerf_tpu.ops import query as Q

    rng = np.random.RandomState(5)
    BG, Rg, SR, C = 3, 11, 6, 4
    counts = jnp.asarray(rng.randint(0, SR + 1, (BG, Rg)), jnp.int32)
    Ncb = int(np.asarray(counts).sum(-1).max()) - 2  # force some overflow
    Ncb = max(Ncb, 4)
    comp_src, comp_valid, n_total = Q.compact_row_map(counts, Ncb, SR)
    c = jnp.asarray(rng.randn(BG, Ncb, C).astype(np.float32))
    c = c * comp_valid[..., None]  # consumers always mask padded slots

    def scatter_ref(cv):
        rows = Rg * SR
        idx = jnp.where(comp_valid, comp_src, rows + jnp.arange(Ncb)[None])
        def one(i, u):
            return jnp.zeros((rows, C), cv.dtype).at[i].set(
                u, mode="drop", unique_indices=True)
        return jax.vmap(one)(idx, cv).reshape(BG, Rg, SR, C)

    want = np.asarray(scatter_ref(c))
    for flat in (True, False):
        got = np.asarray(Q.expand_compacted(SR, flat, c, counts,
                                            comp_src, comp_valid))
        np.testing.assert_array_equal(got, want, err_msg=f"flat={flat}")

    # VJP: random downstream cotangent; compare against the scatter autodiff
    w = jnp.asarray(rng.randn(BG, Rg, SR, C).astype(np.float32))
    g_ref = jax.grad(lambda cv: jnp.sum(scatter_ref(cv) * w))(c)
    for flat in (True, False):
        g = jax.grad(lambda cv: jnp.sum(
            Q.expand_compacted(SR, flat, cv, counts, comp_src, comp_valid)
            * w))(c)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"flat={flat}")


def _seg_workload(n_pts=400, B=2, R=7, D=64, seed=3):
    """Random cloud + rays crossing it, for occupancy-mask parity tests."""
    import jax
    from pointnerf_tpu.ops import query as Q

    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-0.4, 0.4, (n_pts, 3)).astype(np.float32)
    opt = small_opt(max_o=2048, P=8, ranges=(-0.5, -0.5, -0.5, 0.5, 0.5, 0.5))
    spec = make_grid_spec(opt, xyz.min(0), xyz.max(0), n_pts)
    grid = build_grid(jnp.asarray(xyz), jnp.ones(n_pts, bool), spec)
    campos = rng.uniform(-1.2, -0.8, (B, 3)).astype(np.float32)
    tgt = rng.uniform(-0.3, 0.3, (B, R, 3)).astype(np.float32)
    rd = tgt - campos[:, None]
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    t = np.sort(rng.uniform(0.2, 2.4, (B, R, D)).astype(np.float32), -1)
    raypos = jnp.asarray(campos[:, None, None]
                         + rd[:, :, None] * t[..., None])
    return Q, raypos, grid, spec, jnp.asarray(campos), jnp.asarray(rd), \
        jnp.asarray(t), jnp.asarray(xyz)


def test_mask_raypos_segmented_matches_dense():
    """Segment-cached occupancy == dense mask when U covers every ray's
    distinct-row count (interpret-mode Pallas on CPU)."""
    Q, raypos, grid, spec, *_ = _seg_workload()
    dense = np.asarray(Q.mask_raypos(raypos, grid, spec))
    seg, n_over = Q.mask_raypos_segmented(raypos, grid, spec, U=64,
                                          interpret=True)
    assert int(n_over) == 0
    np.testing.assert_array_equal(np.asarray(seg), dense)
    assert dense.any()  # the workload must actually hit occupancy


def test_mask_raypos_segmented_overflow_is_conservative():
    """Rays past the row budget mark their overflow samples valid (a strict
    superset of the dense mask — nothing real is ever dropped) and are
    counted."""
    Q, raypos, grid, spec, *_ = _seg_workload()
    dense = np.asarray(Q.mask_raypos(raypos, grid, spec))
    seg, n_over = Q.mask_raypos_segmented(raypos, grid, spec, U=2,
                                          interpret=True)
    seg = np.asarray(seg)
    assert int(n_over) > 0
    assert not (dense & ~seg).any()   # superset: no dense-valid lost
    assert seg.sum() > dense.sum()    # and genuinely conservative here


def test_query_grid_points_occ_U_matches_dense():
    """Full query pipeline with occ_U covering == occ_U=0, compacted and
    uncompacted."""
    Q, raypos, grid, spec, campos, rd, t, xyz = _seg_workload()
    for Nc in (0, 48):
        a = Q.query_grid_points(campos, rd, t, xyz, grid, spec,
                                SR=4, K=3, Nc=Nc)
        b = Q.query_grid_points(campos, rd, t, xyz, grid, spec,
                                SR=4, K=3, Nc=Nc, occ_U=64)
        assert int(b[5]) == 0
        for x, y in zip(a[:4], b[:4]):
            if x is None:
                assert y is None
                continue
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        if a[4] is not None:
            for x, y in zip(a[4], b[4]):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
