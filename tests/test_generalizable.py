"""Generalizable (feed-forward) training tests on a DTU-format fixture."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pointnerf_tpu.config import Options
from pointnerf_tpu.data import create_dataset
from pointnerf_tpu.run import train as gen_train

from fixtures import make_dtu_scene


@pytest.fixture(scope="module")
def dtu_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dtu"))
    make_dtu_scene(root, n_views=6, wh=(64, 64))
    return root


def gen_opt(root, out="/tmp/gen_ckpt", **kw):
    return Options(
        experiment="dtu_gen", checkpoints_dir=out,
        data_root=root, scan="scan1", dataset_name="dtu",
        img_wh=(64, 64), random_sample="random", random_sample_size=8,
        bg_color="white",
        feedforward=1, mode=0,
        manual_depth_view=1, depth_grid=16, init_view_num=3,
        depth_vid="0", ref_vid=0, trgt_id=3, num_each_depth=1,
        manual_std_depth=0.0, depth_conf_thresh=0.1, geo_cnsst_num=0,
        appr_feature_str0=("imgfeat_0_0123", "dir_0", "point_conf"),
        point_features_dim=32, shading_feature_mlp_layer0=1,
        ranges=(-0.6, -0.6, -0.25, 0.6, 0.6, 0.25),
        vsize=(0.05, 0.05, 0.05), vscale=(1, 1, 1),
        kernel_size=(3, 3, 3), query_size=(3, 3, 3),
        max_o=16384, P=8, K=4, SR=8, z_depth_dim=48,
        shading_feature_num=32,
        shading_feature_mlp_layer1=1, shading_feature_mlp_layer3=1,
        shading_alpha_mlp_layer=1, shading_color_mlp_layer=2,
        num_feat_freqs=2, dist_xyz_freq=3, num_viewdir_freqs=2,
        which_tonemap_func="off",
        lr=0.001, alter_step=0,
        color_loss_items=("ray_masked_coarse_raycolor", "coarse_raycolor"),
        color_loss_weights=(1.0, 0.1),
        zero_one_loss_items=(), zero_one_loss_weights=(),
        maximum_step=6, print_freq=3, save_iter_freq=6,
    ).replace(**kw)


def test_dtu_dataset(dtu_root):
    opt = gen_opt(dtu_root)
    ds = create_dataset(opt, split="train")
    # 1 scan x 6 viewpoints x 7 lights
    assert len(ds) == 42
    item = ds.get_item(0, rng=np.random.RandomState(0))
    s = item["mvs_sample"]
    assert s["images"].shape == (4, 3, 64, 64)
    assert s["proj_mats"].shape == (4, 4, 3, 4)
    assert s["depths_h"].shape == (4, 64, 64)
    # depth pfm chain lands near the analytic plate depth (world units ~2-4)
    d = s["depths_h"][0]
    nz = d[d > 0]
    assert len(nz) > 100
    assert 2.0 < nz.mean() < 4.0, nz.mean()
    # camera geometry: extrinsic translation rescaled to world (radius 3)
    np.testing.assert_allclose(np.linalg.norm(s["c2ws"][0][:3, 3]), 3.0,
                               rtol=1e-4)
    # target-view rays + gt present
    assert item["raydir"].shape == (1, 64, 3)
    assert item["gt_image"].shape == (1, 64, 3)


def test_depth_consistency_with_gen_points(dtu_root):
    """mode-0 (GT pfm depth) points land on the plate through the DTU chain."""
    from pointnerf_tpu.models.mvs import points_model as pm
    opt = gen_opt(dtu_root, manual_depth_view=0)
    ds = create_dataset(opt, split="train")
    sample = ds.get_item(0, rng=np.random.RandomState(0))["mvs_sample"]
    params = pm.init_mvs_points_params(jax.random.PRNGKey(0), opt)
    out = pm.gen_points(params, opt, sample, jax.random.PRNGKey(1))
    keep = np.asarray(out["keep"]).astype(bool)
    xyz = np.asarray(out["xyz_w"])[keep]
    assert len(xyz) > 100
    # pfm raw->crop->resize chain is nearest-neighbor; tolerate a few pixels
    assert np.percentile(np.abs(xyz[:, 2]), 95) < 0.05
    assert np.abs(xyz[:, :2]).max() < 0.55


def test_generalizable_training_steps(dtu_root, tmp_path):
    opt = gen_opt(dtu_root, out=str(tmp_path))
    res = gen_train.main(opt)
    assert res["total_steps"] == 6
    items = res["last_items"]
    assert np.isfinite(items["loss_total"])
    import os
    assert os.path.exists(os.path.join(str(tmp_path), "dtu_gen", "6_gen.npz"))
    # mvs featurenet params actually updated (trainable), mvsnet frozen
    state = res["state"]
    _, sub = jax.random.split(jax.random.PRNGKey(opt.seed))  # main()'s init key
    fresh = gen_train.create_gen_state(opt, sub)
    # frozen subtree bit-identical
    for a, b in zip(jax.tree.leaves(state.mvs_frozen),
                    jax.tree.leaves(fresh.mvs_frozen)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # trainable subtree changed
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(state.mvs_train),
                             jax.tree.leaves(fresh.mvs_train))]
    assert max(diffs) > 0


def test_feedforward_inference(dtu_root, tmp_path):
    """maximum_step=0 runs pure feed-forward inference (dtu_test_inf parity)."""
    opt = gen_opt(dtu_root, out=str(tmp_path), maximum_step=0,
                  random_sample_size=16)
    res = gen_train.main(opt)
    assert res["n"] == 6  # test split: 1 scan x 6 viewpoints x 1 light
    assert np.isfinite(res["psnr"])
    import os
    assert os.path.exists(os.path.join(
        str(tmp_path), "dtu_gen", "images", "inference",
        "step-0000-coarse_raycolor.png"))


def test_feedforward_inference_frustum(dtu_root, tmp_path):
    """wcoord_query=0 routes inference through the perspective-frustum
    querier with a per-camera grid (the dtu_test_inf default path)."""
    opt = gen_opt(dtu_root, out=str(tmp_path), maximum_step=0,
                  random_sample_size=16, wcoord_query=0,
                  z_depth_dim=16, vscale=(2, 2, 1), P=16,
                  radius_limit_scale=0.0, depth_limit_scale=0.0,
                  shpnt_jitter="uniform")
    res = gen_train.main(opt)
    assert np.isfinite(res["psnr"])
    assert res["n"] == 6


def test_generalizable_training_frustum(dtu_root, tmp_path):
    """Gradients flow through the frustum-queried render (per-step
    perspective grid build inside the jit)."""
    opt = gen_opt(dtu_root, out=str(tmp_path), maximum_step=4,
                  wcoord_query=0, z_depth_dim=16, vscale=(2, 2, 1), P=16,
                  radius_limit_scale=0.0, depth_limit_scale=0.0)
    res = gen_train.main(opt)
    assert res["total_steps"] == 4
    assert np.isfinite(res["last_items"]["loss_total"])
