"""NN<0 vox-grid querier: torch parity vs re-expressions of the reference
(neural_points.py:488-515 construct_grid_points, :580-592 query_vox_grid),
load_blender_cloud/point_noise, and an end-to-end NN=-1 driver run."""

import os
import pickle

import numpy as np
import pytest
import torch

from pointnerf_tpu.ops.voxgrid import (
    construct_grid_points, derive_lattice, build_vox_table, query_vox_grid)


# --------------------------------------------------- torch re-expressions
def torch_construct_grid_points(xyz, construct_res, grid_res):
    """Reference neural_points.py:488-515, float64 for exact comparability."""
    xyz_min, xyz_max = xyz.min(0)[0], xyz.max(0)[0]
    space_edge = torch.max(xyz_max - xyz_min) * 1.1
    xyz_mid = (xyz_max + xyz_min) / 2
    space_min = xyz_mid - space_edge / 2
    construct_vox_sz = space_edge / construct_res
    grid_vox_sz = space_edge / grid_res
    cvox = torch.unique(
        torch.floor((xyz - space_min) / construct_vox_sz).long(), dim=0)
    cg = int(grid_res / construct_res)
    g = torch.arange(cg + 1)
    gx, gy, gz = torch.meshgrid(g, g, g, indexing="ij")
    gxyz = torch.stack([gx, gy, gz], -1).reshape(1, -1, 3)
    sparse = torch.unique((cvox[:, None, :] * cg + gxyz).reshape(-1, 3), dim=0)
    full = torch.full([grid_res + 1] * 3, -1, dtype=torch.int32)
    full[sparse[:, 0], sparse[:, 1], sparse[:, 2]] = torch.arange(
        sparse.shape[0], dtype=torch.int32)
    xyz_out = space_min + sparse * grid_vox_sz
    return xyz_out, full, space_min, float(grid_vox_sz), grid_res


def torch_query_vox_grid(loc, full, space_min, gvs, grid_res):
    """Reference neural_points.py:580-592."""
    B, R, SR, _ = loc.shape
    vox_ind = torch.floor((loc - space_min) / gvs).long()
    shift = torch.tensor([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                          [1, 0, 1], [0, 1, 1], [1, 1, 0], [1, 1, 1]])
    vox_ind = vox_ind[..., None, :] + shift.reshape(1, 1, 1, 8, 3)
    vox_mask = torch.any(
        ((vox_ind < 0) | (vox_ind > grid_res)).reshape(B, R, SR, -1), dim=3)
    vox_ind = torch.clamp(vox_ind, 0, grid_res).reshape(-1, 3)
    inds = full[vox_ind[:, 0], vox_ind[:, 1], vox_ind[:, 2]].reshape(B, R, SR, 8)
    inds[vox_mask, :] = -1
    inds[torch.any(inds < 0, dim=-1), :] = -1
    return inds.long()


def blob_cloud(n=3000, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n, 3) * np.array([0.5, 0.3, 0.8])).astype(np.float64)


def test_construct_grid_points_torch_parity():
    xyz = blob_cloud()
    want_xyz, _, _, want_gvs, _ = torch_construct_grid_points(
        torch.from_numpy(xyz), 8, 32)
    got_xyz, got_gvs = construct_grid_points(xyz, 8, 32)
    assert abs(got_gvs - want_gvs) < 1e-9
    np.testing.assert_allclose(got_xyz, want_xyz.numpy(), atol=1e-5)


def test_query_vox_grid_torch_parity():
    import jax.numpy as jnp
    from pointnerf_tpu.ops.grid import GridSpec  # only for field names
    import dataclasses

    xyz64 = blob_cloud(seed=1)
    tw_xyz, tfull, tsmin, tgvs, G = torch_construct_grid_points(
        torch.from_numpy(xyz64), 6, 24)
    cloud, gvs = construct_grid_points(xyz64, 6, 24)
    # lattice metadata recovered from the snapped cloud alone
    mn, pitch, dims = derive_lattice(cloud.astype(np.float64))
    assert abs(pitch - gvs) < 1e-5 * gvs  # f32 cloud => ~1e-7 rel pitch noise

    class Spec:
        vox_dim = tuple(int(d) for d in dims)
        vox_space_min = tuple(float(v) for v in mn)
        vox_gvs = float(pitch)

    table = build_vox_table(
        jnp.asarray(cloud), jnp.ones(len(cloud), bool), Spec)
    # sample locations: inside, straddling the boundary, far outside
    rng = np.random.RandomState(7)
    loc = rng.uniform(-1.6, 1.6, (1, 64, 12, 3)).astype(np.float64)
    got = np.asarray(query_vox_grid(jnp.asarray(loc), table, Spec))
    want = torch_query_vox_grid(
        torch.from_numpy(loc), tfull, tsmin, tgvs, G).numpy()
    np.testing.assert_array_equal(got, want)
    hit = (got >= 0).all(-1)
    assert hit.any() and (~hit).any()


def test_point_noise_and_cloud_loader(tmp_path):
    from pointnerf_tpu.data.load_blender import (
        load_blender_cloud, apply_point_noise)
    xyz = blob_cloud(500).astype(np.float32)
    norms = np.tile([0.0, 0.0, 1.0], (500, 1)).astype(np.float32)
    p = str(tmp_path / "cloud.pkl")
    with open(p, "wb") as f:
        pickle.dump({"point_xyz": xyz, "point_face_normal": norms}, f)

    got, got_n = load_blender_cloud(p, 200, np.random.RandomState(0))
    assert got.shape == (200, 3) and got_n.shape == (200, 3)
    full, full_n = load_blender_cloud(p, 10000)
    assert full.shape == (500, 3) and full_n is not None

    rng = np.random.RandomState(1)
    j = apply_point_noise(xyz, "pointuniform_0.01", rng)
    assert j.shape == xyz.shape and np.abs(j - xyz).max() <= 0.01 + 1e-6
    assert apply_point_noise(xyz, "pointgaussian_0.0").shape == xyz.shape
    assert np.array_equal(apply_point_noise(xyz, "pointgaussian_0.0"), xyz)
    assert apply_point_noise(xyz, "pointuniformadd_0.01",
                             rng).shape == (1000, 3)
    assert apply_point_noise(xyz, "pointuniformdouble_0.01",
                             rng).shape == (1000, 3)
    with pytest.raises(ValueError):
        apply_point_noise(xyz, "bogus_0.01")


def test_nn_neg1_driver_end_to_end(tmp_path):
    """Full finetune driver with the vox-grid querier: pickled cloud ->
    construct lattice -> trilinear 8-corner shading; loss finite, PSNR sane."""
    from fixtures import make_nerf_synth_scene
    from pointnerf_tpu.config import Options
    from pointnerf_tpu.run import train_ft

    root = str(tmp_path)
    make_nerf_synth_scene(root, scan="plate", n_train=8, n_test=2, wh=(36, 36))
    # plate-shaped pickle cloud for cloud_path
    g = np.linspace(-0.42, 0.42, 30)
    gx, gy = np.meshgrid(g, g, indexing="ij")
    cloud = np.stack([gx, gy, np.zeros_like(gx) + 0.01 * np.sin(gx * 7)],
                     -1).reshape(-1, 3).astype(np.float32)
    cpath = os.path.join(root, "plate_cloud.pkl")
    with open(cpath, "wb") as f:
        pickle.dump({"point_xyz": cloud}, f)

    opt = Options(
        experiment="voxgrid_e2e", checkpoints_dir=os.path.join(root, "ckpt"),
        data_root=root, scan="plate", dataset_name="nerf_synth360_ft",
        img_wh=(36, 36), load_points=1, cloud_path=cpath, num_point=2000,
        point_noise="pointuniform_0.002", NN=-1,
        construct_res=16, grid_res=32,
        agg_distance_kernel="trilinear", agg_weight_norm=0,
        random_sample="random", random_sample_size=12,
        near_plane=2.0, far_plane=6.0, bg_color="white",
        vsize=(0.04, 0.04, 0.04), vscale=(1, 1, 1),
        kernel_size=(3, 3, 3), query_size=(3, 3, 3),
        max_o=20000, P=8, K=8, SR=16, z_depth_dim=64,
        point_features_dim=16, shading_feature_num=32,
        shading_feature_mlp_layer1=1, shading_feature_mlp_layer3=1,
        shading_alpha_mlp_layer=1, shading_color_mlp_layer=2,
        num_feat_freqs=2, dist_xyz_freq=3, num_viewdir_freqs=2,
        default_conf=0.4, lr=0.002, plr=0.0,
        maximum_step=20, print_freq=10, save_iter_freq=20, test_freq=0,
        test_num=1, test_num_step=2, prune_iter=0, prob_freq=0,
        save_point_freq=0,
    )
    res = train_ft.main(opt)
    assert res["total_steps"] == 20
    assert np.isfinite(res["final_psnr"]) and res["final_psnr"] > 5.0
