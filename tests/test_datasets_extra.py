"""Tests for the T&T, ScanNet, and LLFF datasets on synthetic fixtures."""

import os

import numpy as np
import pytest

from pointnerf_tpu.config import Options
from pointnerf_tpu.data import create_dataset

from fixtures import make_tt_scene, make_scannet_scene, make_llff_scene


def check_center_ray_hits_plate(item, tol=0.2):
    """The central pixel's ray must hit near the plate center (all fixtures
    aim their cameras at/near the origin plate)."""
    campos = item["campos"][0]
    R = item["raydir"].shape[1]
    side = int(np.sqrt(R))
    center = item["raydir"][0].reshape(-1, 3)[R // 2 + side // 2]
    center = center / np.linalg.norm(center)
    t = (0.0 - campos[2]) / center[2]
    hit = campos + t * center
    assert t > 0
    assert np.abs(hit[:2]).max() < tol + np.abs(campos[:2]).max() * 0.5, hit


# --------------------------------------------------------------------- T&T
def test_tt_dataset(tmp_path):
    make_tt_scene(str(tmp_path), wh=(40, 40))
    opt = Options(data_root=str(tmp_path), scan="Truck", dataset_name="tt_ft",
                  img_wh=(40, 40), random_sample="random", random_sample_size=6,
                  near_plane=1.5, far_plane=5.0, bg_color="white",
                  ranges=(-100.0,) * 3 + (100.0,) * 3)
    ds = create_dataset(opt, split="train")
    assert len(ds) == 6
    # bbox.txt parsed
    np.testing.assert_allclose(ds.spacemin, [-0.5, -0.5, -0.2])
    np.testing.assert_allclose(ds.spacemax, [0.5, 0.5, 0.2])
    item = ds.get_item(0, full_img=True)
    assert item["gt_image"].shape == (1, 1600, 3)
    check_center_ray_hits_plate(item)
    # white bg from RGBA composite
    gt = item["gt_image"][0].reshape(40, 40, 3)
    assert np.allclose(gt[0, 0], 1.0)

    ds_test = create_dataset(opt, split="test")
    assert len(ds_test) == 2

    ds_r = create_dataset(opt, split="render")
    assert len(ds_r) == 100
    item_r = ds_r.get_dummyrot_item(0)
    assert "gt_image" not in item_r


# ------------------------------------------------------------------ ScanNet
def test_scannet_dataset(tmp_path):
    make_scannet_scene(str(tmp_path), n=10, wh=(40, 30))
    opt = Options(data_root=str(tmp_path), scan="scene0101_04",
                  dataset_name="scannet_ft", img_wh=(40, 30),
                  random_sample="random", random_sample_size=6,
                  near_plane=0.1, far_plane=8.0, bg_color="black",
                  ranges=(-100.0,) * 3 + (100.0,) * 3, test_num_step=5)
    ds = create_dataset(opt, split="train")
    assert len(ds) == 2  # step-5 nsvf split of 10 frames
    ds_test = create_dataset(opt, split="test")
    assert len(ds_test) == 8
    item = ds.get_item(0, full_img=True)
    assert item["gt_image"].shape == (1, 40 * 30, 3)
    check_center_ray_hits_plate(item)

    # mesh init points
    xyz = ds.load_init_points()
    assert xyz.shape == (400, 3)

    # sensor-depth backprojection lands on the plate
    pts = ds.load_init_depth_points()
    assert len(pts) > 500
    assert np.abs(pts[:, 2]).max() < 5e-3, np.abs(pts[:, 2]).max()
    assert np.abs(pts[:, :2]).max() <= 0.45

    # blur list removal
    with open(os.path.join(ds.exported, "blur_list.txt"), "w") as f:
        f.write("0\n")
    ds2 = create_dataset(opt, split="train")
    assert len(ds2) == 1

    # blur scoring runs
    blurry = ds.detect_blurry(ds.all_id_list, worst=3)
    assert len(blurry) == 3


# --------------------------------------------------------------------- LLFF
def test_llff_dataset(tmp_path):
    make_llff_scene(str(tmp_path), n=9, wh=(40, 30))
    opt = Options(data_root=str(tmp_path), scan="fern", dataset_name="llff_ft",
                  img_wh=(40, 30), random_sample="random", random_sample_size=6,
                  bg_color="white", testskip=4)
    ds = create_dataset(opt, split="train")
    ds_test = create_dataset(opt, split="test")
    assert len(ds) + len(ds_test) == 9
    assert len(ds_test) == 3
    # near_far derived from scaled bounds
    assert 0 < ds.near_far[0] < ds.near_far[1]
    item = ds.get_item(0, full_img=True)
    assert item["gt_image"].shape == (1, 40 * 30, 3)
    assert np.isfinite(item["raydir"]).all()
    # poses centered: camera centers average near origin
    centers = ds.all_c2ws[:, :3, 3]
    assert np.linalg.norm(centers.mean(0)) < 0.5


def test_scannet_metric_depth_supervision(tmp_path):
    """With --depth_loss_items, ScanNet loads REAL sensor z-depth (meters)
    into gt_depth — not the all-ones placeholder — and it matches the
    fixture's analytic camera-z of the plate."""
    make_scannet_scene(str(tmp_path), n=10, wh=(40, 30))
    opt = Options(data_root=str(tmp_path), scan="scene0101_04",
                  dataset_name="scannet_ft", img_wh=(40, 30),
                  random_sample="random", random_sample_size=6,
                  near_plane=0.1, far_plane=8.0, bg_color="black",
                  ranges=(-100.0,) * 3 + (100.0,) * 3, test_num_step=5,
                  depth_loss_items=("coarse_depth",),
                  depth_loss_weights=(0.1,))
    ds = create_dataset(opt, split="train")
    assert getattr(ds, "has_metric_depth", False)
    item = ds.get_item(0, full_img=True)
    d = item["gt_depth"].reshape(30, 40)
    hit = d > 0
    assert hit.any()
    # plate sits at z=0, cameras ~2.5 away: metric depth, not mask values
    assert 1.0 < float(np.median(d[hit])) < 4.0
    # analytic check at the exact pixels: reconstruct camera z from the pose
    i = ds.id_list[0]
    c2w = ds.cam2worlds[0]
    W, H, focal = 40, 30, 35.0
    px, py = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    d_cam = np.stack([(px - W / 2) / focal, (py - H / 2) / focal,
                      np.ones_like(px)], -1)
    d_w = d_cam @ c2w[:3, :3].T
    t = (0.0 - c2w[2, 3]) / d_w[..., 2]
    want = np.where(hit, t, 0.0)
    np.testing.assert_allclose(d[hit], want[hit], atol=2e-3)


def test_train_ft_on_scannet_depth_init(tmp_path):
    """Cross-dataset E2E: the finetune driver runs on ScanNet with
    load_points=2 (sensor-depth backprojection init)."""
    from pointnerf_tpu.run import train_ft
    make_scannet_scene(str(tmp_path), n=10, wh=(40, 30))
    opt = Options(
        experiment="scannet_e2e", checkpoints_dir=str(tmp_path / "ckpt"),
        data_root=str(tmp_path), scan="scene0101_04",
        dataset_name="scannet_ft", img_wh=(40, 30), load_points=2,
        random_sample="random", random_sample_size=10,
        near_plane=0.1, far_plane=8.0, bg_color="black", test_num_step=5,
        ranges=(-0.55, -0.55, -0.2, 0.55, 0.55, 0.2),
        vsize=(0.04, 0.04, 0.04), vscale=(1, 1, 1),
        kernel_size=(3, 3, 3), query_size=(3, 3, 3),
        max_o=16384, P=8, K=4, SR=12, z_depth_dim=64, vox_res=50,
        point_features_dim=16, shading_feature_num=32,
        shading_feature_mlp_layer1=1, shading_feature_mlp_layer3=1,
        shading_alpha_mlp_layer=1, shading_color_mlp_layer=2,
        num_feat_freqs=2, dist_xyz_freq=3, num_viewdir_freqs=2,
        default_conf=0.4, lr=0.002, plr=0.005,
        maximum_step=30, print_freq=15, save_iter_freq=30, test_freq=0,
        test_num=1, prune_iter=0, prob_freq=0, save_point_freq=0,
    )
    res = train_ft.main(opt)
    assert res["total_steps"] == 30
    assert np.isfinite(res["final_psnr"]) and res["final_psnr"] > 8.0


def test_llff_render_split_spiral_path():
    """LLFF render split: euler-interpolated fly-through poses
    (reference utils/util.py:34-64) + GT-free render items."""
    import tempfile
    root = tempfile.mkdtemp(prefix="llff_r_")
    make_llff_scene(root, n=9, wh=(40, 30))
    opt = Options(data_root=root, scan="fern", dataset_name="llff_ft",
                  img_wh=(40, 30), random_sample="random",
                  random_sample_size=6, bg_color="white", testskip=4)
    ds = create_dataset(opt, split="render")
    n_train = 6  # 9 views, every-4th held out -> 3 test
    assert len(ds) == n_train * (30 // 3)
    poses = ds.render_poses
    assert poses.shape == (len(ds), 4, 4)
    # rotations stay orthonormal through the euler interpolation
    RtR = np.einsum("nij,nik->njk", poses[:, :3, :3], poses[:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (len(ds), 1, 1)),
                               atol=1e-5)
    # the first pose of each segment is the segment's START training pose
    np.testing.assert_allclose(poses[0, :3, 3], ds.cam2worlds[0, :3, 3],
                               atol=1e-5)
    # path stays within the bounding box of the training cameras (convex interp
    # of positions)
    lo, hi = ds.cam2worlds[:, :3, 3].min(0), ds.cam2worlds[:, :3, 3].max(0)
    assert (poses[:, :3, 3] >= lo - 1e-4).all()
    assert (poses[:, :3, 3] <= hi + 1e-4).all()
    item = ds.get_dummyrot_item(3)
    assert item.get("gt_image") is None
    assert np.isfinite(item["raydir"]).all()
    assert item["raydir"].shape == (1, 40 * 30, 3)


# --------------------------------------------------- legacy nerf_synth (non-360)
def _write_legacy_configs(root, scan="plate", n_ref=4, n_extra=2, n_test=3):
    """Curated pairs files in the reference's format: the pairs txt
    (nerf_synth_ft_dataset.py:278-293) + the pairs.th split table (:296)."""
    import torch
    lst_dir = os.path.join(root, "nerf_synth_configs", "list")
    os.makedirs(lst_dir, exist_ok=True)
    refs = list(range(n_ref))
    lines = [f"{n_ref},{n_ref + n_extra}"]
    for i in range(n_ref + n_extra):
        ref = refs[i % n_ref]
        srcs = [refs[(i + 1) % n_ref], refs[(i + 2) % n_ref]]
        lines += [str(ref), ",".join(map(str, srcs))]
    with open(os.path.join(lst_dir, f"{scan}_finetune_init_pairs_final.txt"),
              "w") as f:
        f.write("\n".join(lines) + "\n")
    cfg_dir = os.path.join(root, "dtu_configs")
    os.makedirs(cfg_dir, exist_ok=True)
    torch.save({f"{scan}_test": list(range(n_ref, n_ref + n_test)),
                f"{scan}_val": [n_ref]}, os.path.join(cfg_dir, "pairs.th"))


def test_nerf_synth_ft_legacy_dataset(tmp_path):
    """The legacy non-360 variant (reference data/nerf_synth_ft_dataset.py):
    pairs-file view groups, test ids indexing TRAIN frames, fixed [2,6]
    near/far, blender-raydir render path."""
    from fixtures import make_nerf_synth_scene
    root = str(tmp_path)
    make_nerf_synth_scene(root, wh=(40, 40), n_train=12)
    _write_legacy_configs(root)
    opt = Options(data_root=root, scan="plate", dataset_name="nerf_synth_ft",
                  img_wh=(40, 40), random_sample="random",
                  random_sample_size=6, near_plane=2.0, far_plane=4.5,
                  bg_color="white")

    ds = create_dataset(opt, split="train")
    assert ds.id_list == [0, 1, 2, 3]          # refs from the pairs txt
    assert len(ds.view_id_list) == 6           # incl. 2 extra init groups
    assert ds.view_id_list[0] == [0, 1, 2]     # remapped to positions
    # items carry the fixed blender range, NOT the CLI planes (reference :497)
    item = ds.get_item(0, full_img=True)
    assert float(item["near"]) == 2.0 and float(item["far"]) == 6.0
    check_center_ray_hits_plate(item)
    init = ds.get_init_item(4)                 # an extra (non-ref) group
    assert init["images"].shape == (3, 3, 40, 40)
    assert init["proj_mats"].shape == (3, 3, 3, 4)
    np.testing.assert_allclose(init["near_fars"], [[2, 6]] * 3)

    # test split: ids 4,5,6 of the TRAIN transforms (reference :296)
    ds_t = create_dataset(opt, split="test")
    assert ds_t.id_list == [4, 5, 6]
    with open(os.path.join(root, "plate", "transforms_train.json")) as f:
        import json
        train_meta = json.load(f)
    expected = np.array(train_meta["frames"][4]["transform_matrix"])
    np.testing.assert_allclose(ds_t.cam2worlds[0, :3, 3],
                               expected[:3, 3], atol=1e-6)

    # render path: blender focal raydir (reference :643) — center pixel looks
    # along -z_cam = camera forward
    ds_r = create_dataset(opt, split="render")
    item_r = ds_r.get_dummyrot_item(0)
    assert "gt_image" not in item_r
    R = item_r["raydir"].shape[1]
    side = int(np.sqrt(R))
    center = item_r["raydir"][0][R // 2 + side // 2]
    fwd = -ds_r.render_poses[0][:3, 2]
    assert np.dot(center / np.linalg.norm(center), fwd) > 0.99


def test_nerf_synth_ft_fallback_and_normview(tmp_path):
    """Without the curated lists the dataset still loads (hull triplets,
    testskip); --normview 1 re-expresses all poses in the first test cam's
    frame (reference :119-126, normalize_cam :236-256)."""
    from fixtures import make_nerf_synth_scene
    root = str(tmp_path)
    make_nerf_synth_scene(root, wh=(40, 40), n_train=8)
    opt = Options(data_root=root, scan="plate", dataset_name="nerf_synth_ft",
                  img_wh=(40, 40), random_sample="random",
                  random_sample_size=6, bg_color="white", testskip=2)
    ds = create_dataset(opt, split="train")
    assert ds.id_list == list(range(8))
    assert len(ds.view_id_list) >= 2           # hull triplets fallback
    ds_t = create_dataset(opt, split="test")
    assert ds_t.id_list == [0, 2, 4, 6]

    dsn = create_dataset(opt.replace(normview=1), split="train")
    # frame 0 is the norm camera (no pairs.th -> first train frame): its
    # normalized pose must be the identity
    np.testing.assert_allclose(dsn.cam2worlds[0], np.eye(4), atol=1e-5)
    # relative geometry is preserved: pairwise camera distances unchanged
    d0 = np.linalg.norm(ds.cam2worlds[:, :3, 3][:, None]
                        - ds.cam2worlds[:, :3, 3][None], axis=-1)
    d1 = np.linalg.norm(dsn.cam2worlds[:, :3, 3][:, None]
                        - dsn.cam2worlds[:, :3, 3][None], axis=-1)
    np.testing.assert_allclose(d0, d1, atol=1e-4)
