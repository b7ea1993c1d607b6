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
