"""End-to-end driver test: full train_ft on the synthetic plate scene.

Exercises the whole stack the way a user runs it: dataset from disk → COLMAP
point init → voxel downsample → jitted train loop → prune → probe/grow →
chunked test render → checkpoints → metrics. The reference has no such test;
its acceptance test is per-scene PSNR (SURVEY.md §4).
"""

import os

import numpy as np
import pytest

from pointnerf_tpu.config import Options
from pointnerf_tpu.run import train_ft
from pointnerf_tpu.run.common import options_from_cli, construct_vox_points_closest

from fixtures import make_nerf_synth_scene


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    make_nerf_synth_scene(root, wh=(40, 40))
    return root


def tiny_train_opt(root, out, **kw):
    return Options(
        experiment="plate_e2e", checkpoints_dir=out, load_points=1,
        data_root=root, scan="plate", dataset_name="nerf_synth360_ft",
        img_wh=(40, 40), random_sample="random", random_sample_size=12,
        near_plane=2.0, far_plane=4.5, bg_color="white",
        ranges=(-0.55, -0.55, -0.15, 0.55, 0.55, 0.15),
        vsize=(0.04, 0.04, 0.04), vscale=(1, 1, 1),
        kernel_size=(3, 3, 3), query_size=(3, 3, 3),
        max_o=16384, P=8, K=4, SR=12, z_depth_dim=64,
        radius_limit_scale=4.0, vox_res=64,
        point_features_dim=16, feature_init_method="rand",
        num_feat_freqs=2, dist_xyz_freq=3, num_viewdir_freqs=2, num_pos_freqs=4,
        shading_feature_num=64,
        shading_feature_mlp_layer1=1, shading_feature_mlp_layer3=1,
        shading_alpha_mlp_layer=1, shading_color_mlp_layer=2,
        agg_intrp_order=2, agg_distance_kernel="linear", agg_dist_pers=20,
        point_conf_mode="1", point_color_mode="1", point_dir_mode="1",
        which_tonemap_func="off", default_conf=0.4,
        lr=0.002, plr=0.005,
        color_loss_items=("ray_masked_coarse_raycolor",
                          "ray_miss_coarse_raycolor", "coarse_raycolor"),
        color_loss_weights=(1.0, 0.0, 0.0),
        zero_one_loss_items=("conf_coefficient",),
        zero_one_loss_weights=(0.0001,),
        maximum_step=260,
        prune_iter=100, prune_thresh=0.05, prune_max_iter=100000,
        prob_freq=120, prob_num_step=4, prob_thresh=0.5, prob_mul=0.5,
        prob_kernel_size=(3.0, 3.0, 3.0), prob_tiers=(100000,),
        print_freq=50, save_iter_freq=130, save_point_freq=130,
        test_freq=0, test_num=2,
    ).replace(**kw)


def test_train_ft_end_to_end(scene_root, tmp_path):
    opt = tiny_train_opt(scene_root, str(tmp_path))
    result = train_ft.main(opt)
    assert result["total_steps"] == 260
    # the plate scene must be learnable well past "everything is bg" quality
    assert result["final_psnr"] > 16.0, result["final_psnr"]
    # checkpoints + logs + metrics on disk
    exp = os.path.join(str(tmp_path), "plate_e2e")
    assert os.path.exists(os.path.join(exp, "log.txt"))
    assert os.path.exists(os.path.join(exp, "260_net_ray_marching.npz"))
    assert os.path.exists(os.path.join(exp, "opt.json"))
    assert "psnr" in result["scores"] and result["scores"]["psnr"] > 16.0
    # resume: second call loads the checkpoint and stops immediately
    res2 = train_ft.main(opt)
    assert res2["total_steps"] == 260


def test_cli_options_roundtrip(scene_root, tmp_path):
    opt = options_from_cli([
        "--preset", "nerf_synth:lego",
        "--data_root", scene_root,
        "--random_sample_size", "12",
        "--vsize", "0.01", "0.01", "0.01",
        "--maximum_step", "5",
    ])
    assert opt.scan == "lego"
    assert opt.random_sample_size == 12
    assert opt.vsize == (0.01, 0.01, 0.01)
    assert opt.maximum_step == 5
    assert opt.data_root == scene_root


def test_cli_rejects_unimplemented_flag_values(scene_root):
    """Flags parsed for reference-script parity must raise when set to a
    value whose behavior is not implemented, instead of silently parsing."""
    with pytest.raises(NotImplementedError):
        options_from_cli(["--preset", "nerf_synth:lego",
                          "--which_agg_model", "sh"])
    with pytest.raises(ValueError):
        # mismatched weight count (must be 1 or len(items))
        options_from_cli(["--preset", "nerf_synth:lego",
                          "--depth_loss_items", "coarse_depth",
                          "--depth_loss_weights", "0.1", "0.2"])
    # depth/bg/l2_size losses themselves are implemented (models/losses.py)
    opt_d = options_from_cli(["--preset", "nerf_synth:lego",
                              "--depth_loss_items", "coarse_depth",
                              "--depth_loss_weights", "0.1"])
    assert opt_d.depth_loss_items == ("coarse_depth",)
    # the shipped dev_script values all pass
    opt = options_from_cli(["--preset", "nerf_synth:lego",
                            "--apply_pnt_mask", "1", "--normview", "0"])
    assert opt.apply_pnt_mask == 1


def test_visual_items_and_test_losses():
    from pointnerf_tpu.run.train_ft import _test_loss_items, _visual_maps
    from pointnerf_tpu.config import Options
    opt = Options(visual_items=("coarse_raycolor", "gt_image",
                                "ray_masked_coarse_raycolor"))
    rng = np.random.RandomState(0)
    img = rng.rand(4, 4, 3).astype(np.float32)
    gt = rng.rand(4, 4, 3).astype(np.float32)
    rm = (rng.rand(4, 4, 1) > 0.5).astype(np.float32)
    maps = {"coarse_raycolor": img, "ray_mask": rm}
    vis = _visual_maps(opt, maps, gt)
    assert set(vis) == {"coarse_raycolor", "gt_image",
                        "ray_masked_coarse_raycolor"}
    masked = vis["ray_masked_coarse_raycolor"]
    np.testing.assert_allclose(masked[rm[..., 0] > 0.5],
                               img[rm[..., 0] > 0.5])
    np.testing.assert_allclose(masked[rm[..., 0] <= 0.5], 1.0)

    items = _test_loss_items(opt, img, gt, rm)
    m = rm.reshape(-1).astype(bool)
    d2 = np.square(img.reshape(-1, 3) - gt.reshape(-1, 3))
    np.testing.assert_allclose(items["loss_ray_masked_coarse_raycolor"],
                               d2[m].mean(), rtol=1e-6)
    np.testing.assert_allclose(items["loss_coarse_raycolor"], d2.mean(),
                               rtol=1e-6)
    np.testing.assert_allclose(items["loss_ray_miss_coarse_raycolor"],
                               d2[~m].sum() / 3.0, rtol=1e-6)


def test_vox_downsample():
    rng = np.random.RandomState(0)
    xyz = rng.uniform(-1, 1, (5000, 3))
    kept, idx = construct_vox_points_closest(xyz, 8)
    # boundary points land in bin vox_res, so up to (res+1)^3 voxels
    assert 100 < len(kept) <= 9 ** 3
    np.testing.assert_allclose(kept, xyz[idx])
    # exactly one representative per occupied voxel (use the function's metric)
    vsize = (xyz.max(0) - xyz.min(0)).max() / 8
    kcoords = np.floor((xyz[idx] - xyz.min(0)) / vsize).astype(int)
    assert len(np.unique(kcoords, axis=0)) == len(kept)


def test_train_ft_multichip_matches_single_chip(scene_root, tmp_path):
    """The FULL driver on the virtual 8-device mesh — ray-dp x point-sharded
    (n_devices=8, mesh_points=2), prune + probe/grow firing under the sharded
    state (gather -> host rebuild -> reshard), SPMD eval renders — must land
    at the single-chip run's PSNR. The reference's DataParallel equivalent
    (--gpu_ids) is never tested there (SURVEY.md §4 item 5)."""
    opt1 = tiny_train_opt(scene_root, str(tmp_path), experiment="plate_1chip")
    res1 = train_ft.main(opt1)
    assert res1["total_steps"] == 260

    opt8 = tiny_train_opt(scene_root, str(tmp_path), experiment="plate_8chip",
                          n_devices=8, mesh_points=2)
    res8 = train_ft.main(opt8)
    assert res8["total_steps"] == 260
    assert res8["final_psnr"] > 16.0, res8["final_psnr"]
    # same data order/seed, numerically-matched steps: trajectories agree to
    # float-reassociation noise across 260 steps + prune + grow
    assert abs(res8["final_psnr"] - res1["final_psnr"]) < 0.5, \
        (res8["final_psnr"], res1["final_psnr"])


def test_gpu_ids_maps_to_n_devices(scene_root):
    """--gpu_ids with multiple ids must engage the mesh, not silently no-op
    (the reference's DataParallel flag, options/base_options.py:79-82)."""
    opt = options_from_cli([
        "--preset", "nerf_synth:lego", "--data_root", scene_root,
        "--gpu_ids", "0", "1", "2", "3",
    ])
    assert opt.n_devices == 4
    from pointnerf_tpu.parallel import make_runner
    runner = make_runner(opt)
    assert runner is not None and runner.n_devices == 4
    assert runner.mesh.axis_names == ("batch", "rays")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        options_from_cli(["--preset", "nerf_synth:lego",
                          "--data_root", scene_root,
                          "--gpu_ids", "0", "1", "--n_devices", "4"])


def test_train_ft_superset_query_quality(scene_root, tmp_path):
    """The superset-bucket query must train to comparable quality."""
    opt = tiny_train_opt(scene_root, str(tmp_path), maximum_step=200,
                         prune_iter=0, prob_freq=0, save_iter_freq=200,
                         save_point_freq=0, test_freq=0,
                         experiment="plate_superset", superset_P=64)
    result = train_ft.main(opt)
    assert result["final_psnr"] > 16.0, result["final_psnr"]
