"""Scene-editing tests: per-point Rw2c aggregation + composite rendering."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pointnerf_tpu.run import editing, train_ft
from pointnerf_tpu.train import trainer
from pointnerf_tpu.models import neural_points as npc
from pointnerf_tpu.models.renderer import render_forward
from pointnerf_tpu.ops.grid import make_grid_spec, build_grid

from fixtures import make_nerf_synth_scene
from test_train_ft_driver import tiny_train_opt
from test_end_to_end import tiny_setup


def test_per_point_rw2c_identity_matches_global():
    """Per-point identity Rw2c must render exactly like the global identity
    (both through the same jitted entry, to avoid jit-vs-eager fusion noise)."""
    opt, state, spec, grid, batch, xyz = tiny_setup()
    ts = trainer.create_train_state(opt, jax.random.PRNGKey(0), state)
    out_ref = trainer.eval_step(ts, grid, batch, opt, spec)

    cap = state["xyz"].shape[0]
    state_pp = dict(state, Rw2c=jnp.tile(jnp.eye(3)[None], (cap, 1, 1)))
    pt_train, pt_static = trainer.split_point_params(state_pp, opt)
    ts_pp = ts._replace(pt_train=pt_train, pt_static=pt_static)
    out_pp = trainer.eval_step(ts_pp, grid, batch, opt, spec)
    np.testing.assert_allclose(np.asarray(out_pp["coarse_raycolor"]),
                               np.asarray(out_ref["coarse_raycolor"]),
                               atol=1e-5)


def test_rotated_scene_renders_consistently():
    """Rotating the cloud + camera together (with per-point Rw2c) must
    reproduce the unrotated render — the full rigid-equivariance check."""
    opt, state, spec, grid, batch, xyz = tiny_setup()
    ts = trainer.create_train_state(opt, jax.random.PRNGKey(0), state)
    out_ref = trainer.eval_step(ts, grid, batch, opt, spec)

    ang = np.deg2rad(90)
    Rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0],
                    [0, 0, 1]], np.float32)
    n = xyz.shape[0]
    cap = state["xyz"].shape[0]
    xyz_r = np.asarray(state["xyz"]) @ Rot.T
    rw2c = np.tile((np.eye(3, dtype=np.float32) @ Rot.T)[None], (cap, 1, 1))
    state_r = dict(state, xyz=jnp.asarray(xyz_r), Rw2c=jnp.asarray(rw2c),
                   dir=jnp.asarray(np.asarray(state["dir"]) @ Rot.T))
    spec_r = make_grid_spec(opt, xyz_r[:n].min(0), xyz_r[:n].max(0),
                            max_points=n)
    grid_r = build_grid(state_r["xyz"], state_r["mask"], spec_r)

    batch_r = dict(batch,
                   campos=jnp.asarray(np.asarray(batch["campos"]) @ Rot.T),
                   camrotc2w=jnp.asarray(
                       Rot @ np.asarray(batch["camrotc2w"])[0])[None],
                   raydir=jnp.asarray(np.asarray(batch["raydir"]) @ Rot.T))
    pt_train_r, pt_static_r = trainer.split_point_params(state_r, opt)
    ts_r = ts._replace(pt_train=pt_train_r, pt_static=pt_static_r)
    out_r = trainer.eval_step(ts_r, grid_r, batch_r, opt, spec_r)
    a = np.asarray(out_r["coarse_raycolor"])
    b = np.asarray(out_ref["coarse_raycolor"])
    # rotation rebins a few boundary samples into different voxels; allow
    # small isolated deviations but require overall agreement
    assert np.abs(a - b).mean() < 5e-4, np.abs(a - b).mean()
    assert np.abs(a - b).max() < 2e-2, np.abs(a - b).max()


def test_editing_driver_composite(tmp_path_factory):
    """Train on the plate, then compose two copies (one shifted up) and render."""
    root = str(tmp_path_factory.mktemp("scene"))
    make_nerf_synth_scene(root, wh=(40, 40))
    out = str(tmp_path_factory.mktemp("ckpt"))
    opt = tiny_train_opt(root, out, maximum_step=80, prune_iter=0, prob_freq=0,
                         save_iter_freq=80, save_point_freq=0, test_freq=0,
                         experiment="plate_src")
    train_ft.main(opt)

    # stage as an edit source with an index subset and a transform
    src = os.path.join(out, "edit_srcs", "plate_src")
    os.makedirs(os.path.join(src, "parts_index"), exist_ok=True)
    os.makedirs(os.path.join(src, "transforms"), exist_ok=True)
    import shutil
    for f in os.listdir(os.path.join(out, "plate_src")):
        if f.endswith(".npz"):
            shutil.copy(os.path.join(out, "plate_src", f), src)
    # index: keep the x<0 half of the ACTIVE points
    raw = dict(np.load(os.path.join(src, "80_net_ray_marching.npz")))
    n = raw["neural_points.xyz"].shape[1]
    keep = raw["neural_points.xyz"][0, :, 0] < 0
    np.savetxt(os.path.join(src, "parts_index", "left.txt"),
               keep.astype(np.int32))
    M = np.eye(4); M[2, 3] = 0.15  # lift by 0.15
    np.savetxt(os.path.join(src, "transforms", "lift.txt"), M)

    eopt = opt.replace(experiment="edited", test_num=1,
                       ranges=(-0.55, -0.55, -0.25, 0.55, 0.55, 0.25))
    res = editing.main(eopt, names=["plate_src", "plate_src"],
                       inds_names=["all", "left"],
                       trans_names=["no", "lift"])
    assert res["n_points"] == n + int(keep.sum())
    assert np.isfinite(res["psnr"])
    exp = os.path.join(out, "edited")
    assert os.path.exists(os.path.join(exp, "0_net_ray_marching.npz"))
