"""SPMD data-parallel tests on the virtual 8-device CPU mesh (conftest).

The reference never tests its DataParallel path (SURVEY.md §4 item 5); here the
sharded train step must reproduce single-chip numerics exactly, because losses are
global masked means (see pointnerf_tpu/parallel/dp.py docstring).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointnerf_tpu.parallel import (
    make_mesh, replicate, shard_batch, make_dp_train_step, make_dp_eval_step)
from pointnerf_tpu.train import trainer

from test_end_to_end import tiny_setup, make_gt


@pytest.fixture(scope="module")
def scene():
    opt, state, spec, grid, batch, xyz = tiny_setup()
    gt, _ = make_gt(batch)
    batch = dict(batch, gt_image=gt)
    return opt, state, spec, grid, batch


def test_mesh_shapes():
    m = make_mesh(8, batch_size=1)
    assert m.axis_names == ("batch", "rays")
    assert m.devices.shape == (1, 8)
    m2 = make_mesh(8, batch_size=2)
    assert m2.devices.shape == (2, 4)


def test_dp_train_step_matches_single_chip(scene):
    opt, state, spec, grid, batch = scene
    key = jax.random.PRNGKey(7)
    ts0 = trainer.create_train_state(opt, jax.random.PRNGKey(3), state)

    ts_ref, items_ref = trainer.train_step(ts0, grid, batch, key, opt, spec)

    mesh = make_mesh(8, batch_size=1)
    ts_m = replicate(ts0, mesh)
    grid_m = replicate(grid, mesh)
    batch_m = shard_batch(batch, mesh)
    step = make_dp_train_step(opt, spec, mesh, batch_m)
    ts_dp, items_dp = step(ts_m, grid_m, batch_m, replicate(key, mesh))

    for k in items_ref:
        np.testing.assert_allclose(np.asarray(items_dp[k]), np.asarray(items_ref[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)
    assert int(ts_dp.step) == int(ts_ref.step)

    # Gradients must match across sharding layouts. (Post-Adam params are NOT
    # compared: the first Adam step is ~sign(g), so epsilon-level float diffs in
    # near-zero grads between the two compiled programs flip entries by ±lr.)
    import functools
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pointnerf_tpu.parallel.mesh import batch_pspec

    _, gn_ref, gp_ref = trainer.compute_grads(ts0, grid, batch, key, opt, spec)
    repl = NamedSharding(mesh, P())
    bspec = {k: NamedSharding(mesh, s) for k, s in batch_pspec(batch_m).items()}
    gfn = jax.jit(functools.partial(trainer.compute_grads_impl, opt=opt, spec=spec),
                  in_shardings=(repl, repl, bspec, repl),
                  out_shardings=(repl, repl, repl))
    _, gn_dp, gp_dp = gfn(ts_m, grid_m, batch_m, replicate(key, mesh))
    # float32 reduction order differs across the 8-way split; compare leaf norms —
    # a wrong/missing psum would be off by ~100%, reduction jitter by <<1%.
    for a, b in zip(jax.tree.leaves(gn_ref) + jax.tree.leaves(gp_ref),
                    jax.tree.leaves(gn_dp) + jax.tree.leaves(gp_dp)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        err = np.linalg.norm(b - a)
        assert err <= 0.05 * np.linalg.norm(a) + 1e-6, (err, np.linalg.norm(a))


def test_dp_eval_matches_single_chip(scene):
    opt, state, spec, grid, batch = scene
    ts = trainer.create_train_state(opt, jax.random.PRNGKey(3), state)
    out_ref = trainer.eval_step(ts, grid, batch, opt, spec)

    mesh = make_mesh(8, batch_size=1)
    batch_m = shard_batch(batch, mesh)
    ev = make_dp_eval_step(opt, spec, mesh, batch_m)
    out_dp = ev(replicate(ts, mesh), replicate(grid, mesh), batch_m)

    np.testing.assert_allclose(np.asarray(out_dp["coarse_raycolor"]),
                               np.asarray(out_ref["coarse_raycolor"]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out_dp["ray_mask"]),
                                  np.asarray(out_ref["ray_mask"]))


def test_points_sharded_step_matches_single_chip(scene):
    """Point-axis (model-parallel) sharding: buffers/buckets/Adam moments
    shard over "points", numerics match the single-chip step."""
    from pointnerf_tpu.parallel import (make_mp_train_step, make_mp_eval_step,
                                        shard_state, shard_grid,
                                        state_shardings)
    from jax.sharding import PartitionSpec as P

    opt, state, spec, grid, batch = scene
    key = jax.random.PRNGKey(7)
    ts0 = trainer.create_train_state(opt, jax.random.PRNGKey(3), state)
    ts_ref, items_ref = trainer.train_step(ts0, grid, batch, key, opt, spec)

    mesh = make_mesh(8, batch_size=1, points=4)
    assert mesh.axis_names == ("batch", "rays", "points")
    assert mesh.devices.shape == (1, 2, 4)

    # capacity-axis leaves actually got the points spec
    sh = state_shardings(ts0, mesh)
    assert sh.pt_train["embedding"].spec == P("points")
    assert jax.tree.leaves(sh.agg_params)[0].spec == P()

    ts_m = shard_state(ts0, mesh)
    grid_m = shard_grid(grid, spec, mesh)
    batch_m = shard_batch(batch, mesh)

    # the sharding must actually DISTRIBUTE memory: each of the 4 point-axis
    # devices holds cap/4 rows of every capacity buffer and bucket table,
    # not a replica (this is the HBM-scaling claim of parallel/points.py)
    cap = ts0.pt_train["embedding"].shape[0]
    emb_shards = ts_m.pt_train["embedding"].addressable_shards
    assert len({s.device for s in emb_shards}) == 8
    per_dev = {s.device: s.data.shape[0] for s in emb_shards}
    assert set(per_dev.values()) == {cap // 4}
    occ_shards = grid_m["occ_2_xyz"].addressable_shards
    assert {s.data.shape[0] for s in occ_shards} == {spec.max_o // 4}
    # dense voxel maps replicate (index-addressed every sample)
    occmap_shards = grid_m["coor_occ_rows"].addressable_shards
    assert all(s.data.shape == grid_m["coor_occ_rows"].shape
               for s in occmap_shards)
    step = make_mp_train_step(opt, spec, mesh, batch_m, ts0, grid)
    ts_mp, items_mp = step(ts_m, grid_m, batch_m, replicate(key, mesh))

    for k in items_ref:
        np.testing.assert_allclose(np.asarray(items_mp[k]),
                                   np.asarray(items_ref[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)
    # updated POINT buffers must match single-chip bit-for-bit-ish: the
    # points-side Adam update is elementwise over the sharded axis, so a
    # wrong gather/scatter partition would corrupt whole shards
    for k in ts_ref.pt_train:
        a = np.asarray(ts_ref.pt_train[k], np.float64)
        b = np.asarray(ts_mp.pt_train[k], np.float64)
        err = np.linalg.norm(b - a)
        assert err <= 0.05 * np.linalg.norm(a) + 1e-6, (k, err)

    # eval through the same shardings
    ev = make_mp_eval_step(opt, spec, mesh, batch_m, ts0, grid)
    out = ev(ts_m, grid_m, batch_m)
    ref = trainer.eval_step(ts0, grid, batch, opt, spec)
    np.testing.assert_allclose(np.asarray(out["coarse_raycolor"]),
                               np.asarray(ref["coarse_raycolor"]),
                               rtol=2e-5, atol=2e-5)


def test_render_image_mesh_serving_matches_single_chip(scene):
    """Full-image SPMD serving: render_image(mesh=...) shards the stacked
    wide program's ray axis over the mesh and must reproduce the
    single-device image — with replicated tables (pure dp) AND with
    point-sharded state/grid (GSPMD-inserted cross-chip gathers)."""
    from pointnerf_tpu.run.common import render_image
    from pointnerf_tpu.parallel import shard_state, shard_grid

    opt, state, spec, grid, batch = scene
    ts = trainer.create_train_state(opt, jax.random.PRNGKey(3), state)
    R = int(batch["raydir"].shape[1])
    side = int(np.sqrt(R))
    ii, jj = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    item = {
        "raydir": np.asarray(batch["raydir"]),
        "campos": np.asarray(batch["campos"]),
        "camrotc2w": np.asarray(batch["camrotc2w"]),
        "near": batch["near"], "far": batch["far"],
        "bg_color": np.asarray(batch["bg_color"]),
        "pixel_idx": np.stack([jj.ravel(), ii.ravel()], -1)[None],
        "h": side, "w": side,
    }
    opt_r = opt.replace(random_sample_size=4, SR_budget=0)  # 4 chunks of 16
    ref = render_image(ts, grid, opt_r, spec, item, group=3)

    mesh = make_mesh(8, batch_size=1)  # 16-ray chunk axis over 8 devices
    out_dp = render_image(replicate(ts, mesh), replicate(grid, mesh), opt_r,
                          spec, item, group=3, mesh=mesh)
    np.testing.assert_allclose(out_dp["coarse_raycolor"],
                               ref["coarse_raycolor"], rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(out_dp["ray_mask"], ref["ray_mask"])

    mesh_mp = make_mesh(8, batch_size=1, points=4)
    out_mp = render_image(shard_state(ts, mesh_mp),
                          shard_grid(grid, spec, mesh_mp), opt_r, spec, item,
                          group=3, mesh=mesh_mp)
    np.testing.assert_allclose(out_mp["coarse_raycolor"],
                               ref["coarse_raycolor"], rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(out_mp["ray_mask"], ref["ray_mask"])


def test_comp_groups_matches_global_compaction(scene):
    """comp_groups=G computes the same row SET as the global budget when
    every group's slice covers its valid rows — outputs identical (see
    Options.comp_groups / query_grid_points G doc)."""
    opt, state, spec, grid, batch = scene
    key = jax.random.PRNGKey(7)
    outs = {}
    for G in (1, 2, 4):
        # k_tier_wide_frac=1.0: the default 0.25 wide-tier budget overflows
        # this dense scene at SR_budget=511; a covering wide budget keeps
        # the overflow==0 precondition while ALSO exercising the tier split
        # across comp groups (k_tier defaults to auto=1)
        o = opt.replace(SR_budget=511, comp_groups=G, k_tier_wide_frac=1.0)
        ts0 = trainer.create_train_state(o, jax.random.PRNGKey(3), state)
        ts1, items = trainer.train_step(ts0, grid, batch, key, o, spec)
        assert int(items["sr_overflow"]) == 0, G
        out = trainer.eval_step(ts0, grid, batch, o, spec)
        outs[G] = (items, out)
    for G in (2, 4):
        for k in outs[1][0]:
            np.testing.assert_allclose(
                np.asarray(outs[G][0][k]), np.asarray(outs[1][0][k]),
                rtol=2e-5, atol=2e-6, err_msg=f"G={G} {k}")
        np.testing.assert_allclose(
            np.asarray(outs[G][1]["coarse_raycolor"]),
            np.asarray(outs[1][1]["coarse_raycolor"]), rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(
            np.asarray(outs[G][1]["ray_mask"]),
            np.asarray(outs[1][1]["ray_mask"]))


def test_comp_groups_shards_shade_phase(scene):
    """Scaling regression: with comp_groups set (as the parallel factories
    do), the partitioned DP program's compacted-phase matmuls run at
    per-shard row counts — NOT the global row count. Without blocked
    compaction GSPMD replicated the whole shade+backward phase per device
    (round-5 finding, scripts/mp_hlo_context.py)."""
    import re
    opt, state, spec, grid, batch = scene
    o = opt.replace(SR_budget=511)
    ts0 = trainer.create_train_state(o, jax.random.PRNGKey(3), state)
    mesh = make_mesh(8, batch_size=1)
    ts_m = replicate(ts0, mesh)
    grid_m = replicate(grid, mesh)
    batch_m = shard_batch(batch, mesh)
    step = make_dp_train_step(o, spec, mesh, batch_m)
    txt = step.lower(ts_m, grid_m, batch_m,
                     replicate(jax.random.PRNGKey(7), mesh)).compile().as_text()
    # compacted rows: global Ncb*K = 511*4 = 2044; per shard ~ 256.
    # The trunk matmuls ([rows, shading_feature_num=32]) must be local-sized.
    rows = [int(m) for m in re.findall(r"f32\[(\d+),32\]\{[^}]*\} dot", txt)]
    assert rows, "no trunk dots found in partitioned HLO"
    assert max(rows) <= 520, \
        f"shade-phase dot at {max(rows)} rows — compacted phase replicated?"
