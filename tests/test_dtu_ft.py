"""DTU per-scene finetune dataset + plane-background tests."""

import numpy as np
import pytest

from pointnerf_tpu.config import Options
from pointnerf_tpu.data import create_dataset
from pointnerf_tpu.data.fitplane import (best_fit_plane, generate_plane_points,
                                         plane_distance, get_rayplane_cross)

from fixtures import make_dtu_scene


@pytest.fixture(scope="module")
def dtu_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dtu_ft"))
    make_dtu_scene(root, n_views=6, wh=(64, 64))
    return root


def ft_opt(root, **kw):
    return Options(data_root=root, scan="scan1", dataset_name="dtu_ft",
                   img_wh=(64, 64), random_sample="random",
                   random_sample_size=8, bg_color="black", test_num_step=3,
                   point_features_dim=16).replace(**kw)


def test_dtu_ft_dataset(dtu_root):
    opt = ft_opt(dtu_root)
    ds = create_dataset(opt, split="train")
    ds_test = create_dataset(opt, split="test")
    assert len(ds) + len(ds_test) == 6
    assert len(ds_test) == 2  # every 3rd view
    item = ds.get_item(0, rng=np.random.RandomState(0), full_img=True)
    assert item["gt_image"].shape == (1, 64 * 64, 3)
    # near/far from the cam file (world units)
    assert 1.5 < float(item["near"]) < 2.5
    assert 4.0 < float(item["far"]) < 5.0

    # GT-depth init points land on the plate
    pts = ds.load_init_points()
    assert len(pts) > 300
    assert np.percentile(np.abs(pts[:, 2]), 90) < 0.05

    ds_r = create_dataset(opt, split="render")
    assert len(ds_r) == 60
    item_r = ds_r.get_dummyrot_item(0)
    assert "gt_image" not in item_r


def test_plane_machinery(dtu_root):
    opt = ft_opt(dtu_root)
    ds = create_dataset(opt, split="train")
    # hardcoded reference plane params
    pnt, normal, color = ds.get_plane_param(1)
    np.testing.assert_allclose(np.linalg.norm(normal), 1.0, rtol=1e-3)

    # plane points lie exactly on the plane
    xyz, emb, dirs, col, conf = ds.get_plane_param_points(
        np.random.RandomState(0))
    assert xyz.shape == (8000, 3)
    p0, n0, _ = ds.get_plane_param()
    d = plane_distance(xyz, p0, n0)
    assert d.max() < 1e-4
    assert emb.shape == (8000, opt.point_features_dim)
    np.testing.assert_allclose(conf, 0.3)

    # filter_plane rejects on-plane candidates, keeps far ones
    near_plane_pts = xyz[:10]
    far_pts = xyz[:10] + np.asarray(n0) * 1.0
    assert ds.filter_plane(near_plane_pts).all()
    assert not ds.filter_plane(far_pts).any()


def test_fitplane_and_ray_cross():
    rng = np.random.RandomState(0)
    # synth plane: z = 0.5x - 0.25y + 2 + noise
    x = rng.uniform(-1, 1, 500); y = rng.uniform(-1, 1, 500)
    z = 0.5 * x - 0.25 * y + 2 + rng.normal(0, 1e-4, 500)
    pts = np.stack([x, y, z], -1)
    p0, n = best_fit_plane(pts)
    expect_n = np.array([-0.5, 0.25, 1.0]); expect_n /= np.linalg.norm(expect_n)
    np.testing.assert_allclose(np.abs(n @ expect_n), 1.0, atol=1e-3)

    gen = generate_plane_points(p0, n, r=2.0, amount=100,
                                rng=np.random.RandomState(1))
    assert plane_distance(gen, p0, n).max() < 1e-3

    # ray-plane intersection: rays from origin toward the plane
    campos = np.zeros(3, np.float32)
    target = gen[:10]
    raydir = target / np.linalg.norm(target, axis=-1, keepdims=True)
    cross = get_rayplane_cross(campos, raydir.astype(np.float32), p0, n)
    np.testing.assert_allclose(cross, target, atol=1e-3)


FIXTURE_PLANE = ((0.0, 0.0, -0.2), (0.0, 0.0, -1.0), (1.0, 1.0, 1.0))


def test_dtu_ft_init_metas(dtu_root):
    """Pair-file-driven MVS-init bundles (reference dtu_ft build_init_metas
    :399-436 + get_init_item :619-679)."""
    opt = ft_opt(dtu_root, init_view_num=3)
    ds = create_dataset(opt, split="train")
    assert ds.view_id_list == [[0, 1, 2, 3], [2, 3, 4, 5], [4, 5, 0, 1]]
    assert ds.plane_ind == 0  # from dtu_test_ground.txt
    s = ds.get_init_item(0)
    V = 3
    assert s["images"].shape[0] == V and s["images"].shape[1] == 3
    assert s["proj_mats"].shape == (V, V, 3, 4)
    assert s["w2cs"].shape == (V, 4, 4)
    assert s["depths_h"].shape[0] == V
    assert (s["depths_h"] > 0).any()          # pfm depths found
    # ref-view proj mat is identity
    np.testing.assert_allclose(s["proj_mats"][0, 0], np.eye(4)[:3], atol=1e-6)


def test_plane_bg_maps(dtu_root, monkeypatch):
    """set_bg semantics on the fixture: rays that miss the plate should get
    the (white) plane color; foreground projections are excluded."""
    import pointnerf_tpu.data.dtu_ft as dtu_ft_mod
    from pointnerf_tpu.models.mvs import bg as bgmod

    monkeypatch.setattr(dtu_ft_mod, "PLANE_PARAMS",
                        [FIXTURE_PLANE] + dtu_ft_mod.PLANE_PARAMS[1:])
    opt = ft_opt(dtu_root, init_view_num=3)
    ds = create_dataset(opt, split="test")
    ds_train = create_dataset(opt, split="train")
    views = bgmod.collect_bg_views(ds_train, 3)
    assert len(views) == 3 and views[0]["img"].shape[0] == 3

    fg_xyz = ds_train.load_init_points()
    maps = bgmod.create_all_bg(ds, views, fg_xyz, ds.get_plane_param())
    assert len(maps) == len(ds)
    m = maps[0]
    assert m.shape == (64, 64, 3)
    # corners look past the plate: plane-colored (white) in most views
    corners = np.stack([m[2, 2], m[2, -3], m[-3, 2], m[-3, -3]])
    assert (corners.max(-1) > 0.9).any(), corners
    # bg map is a mix of plane hits and zeros, never out of range
    assert m.min() >= 0.0 and m.max() <= 1.0 + 1e-6


def test_train_ft_plane_bg_e2e(dtu_root, tmp_path, monkeypatch):
    """Driver e2e with bgmodel=plane: bg_ray produced, consumed by the
    renderer, training + test render finish finite."""
    import pointnerf_tpu.data.dtu_ft as dtu_ft_mod
    from pointnerf_tpu.run import train_ft

    monkeypatch.setattr(dtu_ft_mod, "PLANE_PARAMS",
                        [FIXTURE_PLANE] + dtu_ft_mod.PLANE_PARAMS[1:])
    opt = ft_opt(
        dtu_root, experiment="dtu_plane_e2e", checkpoints_dir=str(tmp_path),
        bgmodel="plane", load_points=1, init_view_num=3, vox_res=64,
        ranges=(-0.6, -0.6, -0.1, 0.6, 0.6, 0.1),
        vsize=(0.05, 0.05, 0.05), vscale=(1, 1, 1),
        kernel_size=(3, 3, 3), query_size=(3, 3, 3),
        max_o=16384, P=8, K=4, SR=12, z_depth_dim=48,
        radius_limit_scale=4.0, feature_init_method="rand",
        num_feat_freqs=2, dist_xyz_freq=3, num_viewdir_freqs=2,
        num_pos_freqs=4, shading_feature_num=32,
        shading_feature_mlp_layer1=1, shading_feature_mlp_layer3=1,
        shading_alpha_mlp_layer=1, shading_color_mlp_layer=2,
        agg_intrp_order=2, agg_distance_kernel="linear", agg_dist_pers=20,
        point_conf_mode="1", point_color_mode="1", point_dir_mode="1",
        which_tonemap_func="off", default_conf=0.4, lr=0.002, plr=0.005,
        color_loss_items=("ray_masked_coarse_raycolor", "coarse_raycolor"),
        color_loss_weights=(1.0, 0.0),
        zero_one_loss_items=("conf_coefficient",),
        zero_one_loss_weights=(0.0001,),
        maximum_step=8, steps_per_dispatch=2, prune_iter=-1, prob_freq=0,
        print_freq=4, save_iter_freq=8, save_point_freq=0, test_freq=0,
        test_num=1,
    )
    result = train_ft.main(opt)
    assert result["total_steps"] == 8
    assert np.isfinite(result["final_psnr"])
    # the plane bg must have been precomputed (log line)
    log = open(f"{tmp_path}/dtu_plane_e2e/log.txt").read()
    assert "plane background precomputed" in log
