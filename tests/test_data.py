"""Data layer tests: PLY IO, dataset parsing, ray geometry, sampling modes."""

import os

import numpy as np
import pytest

from pointnerf_tpu.config import Options
from pointnerf_tpu.data import create_dataset, find_dataset_class_by_name
from pointnerf_tpu.data.ply import read_ply_points, write_ply_points
from pointnerf_tpu.data.base import sample_pixels, chunks_of_item
from pointnerf_tpu.data.nerf_synth360_ft import hull_view_triplets, pose_spherical

from fixtures import make_nerf_synth_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nerf_synth"))
    make_nerf_synth_scene(root, wh=(40, 40))
    return root


def make_opt(root, **kw):
    return Options(
        data_root=root, scan="plate", dataset_name="nerf_synth360_ft",
        img_wh=(40, 40), random_sample="random", random_sample_size=8,
        near_plane=2.0, far_plane=4.5, bg_color="white",
    ).replace(**kw)


def test_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    xyz = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    for binary in (True, False):
        p = os.path.join(str(tmp_path), f"t_{binary}.ply")
        write_ply_points(p, xyz, rgb, binary=binary)
        x2, c2 = read_ply_points(p)
        np.testing.assert_allclose(x2, xyz, atol=1e-5)
        np.testing.assert_allclose(c2, rgb, atol=1.0 / 255)


def test_dataset_loading(scene_dir):
    opt = make_opt(scene_dir)
    ds = create_dataset(opt, split="train")
    assert len(ds) == 12
    assert ds.intrinsics.shape == (12, 3, 3)
    # focal matches camera_angle_x at img_wh
    expected_f = 0.5 * 800 / np.tan(0.5 * ds.meta["camera_angle_x"]) * 40 / 800
    np.testing.assert_allclose(ds.focal, expected_f, rtol=1e-6)
    # white bg compositing: far corners of every gt are white
    assert np.allclose(ds.render_gtimgs[0][0, 0], 1.0)
    # plate visible: some pixels differ from bg
    assert (np.abs(ds.render_gtimgs[0] - 1.0) > 0.05).any()


def test_item_geometry(scene_dir):
    """Center-pixel ray must point from campos toward the origin (cameras look
    at the plate center)."""
    opt = make_opt(scene_dir, random_sample="no_crop")
    ds = create_dataset(opt, split="train")
    item = ds.get_item(0, rng=np.random.RandomState(0), full_img=True)
    assert item["raydir"].shape == (1, 40 * 40, 3)
    assert item["gt_image"].shape == (1, 40 * 40, 3)
    campos = item["campos"][0]
    center = item["raydir"][0].reshape(40, 40, 3)[20, 20]
    center = center / np.linalg.norm(center)
    toward = -campos / np.linalg.norm(campos)
    assert np.dot(center, toward) > 0.999, (center, toward)
    # central ray hits near the origin (+0.5 pixel-center offset, like the
    # reference get_dtu_raydir, tilts it ~0.5px/f; amplified by the grazing
    # plane intersection)
    t = (0.0 - campos[2]) / center[2]
    hit = campos + t * center
    assert np.abs(hit[:2]).max() < 0.15


def test_gt_matches_analytic_intersection(scene_dir):
    """gt pixels where rays hit the plate must equal the plate color ramp."""
    opt = make_opt(scene_dir, random_sample="no_crop")
    ds = create_dataset(opt, split="test")
    item = ds.get_item(1, full_img=True)
    campos, rd = item["campos"][0], item["raydir"][0]
    gt = item["gt_image"][0]
    t = (0.0 - campos[2]) / rd[:, 2]
    hit = campos[None] + t[:, None] * rd
    inside = (np.abs(hit[:, 0]) < 0.35) & (np.abs(hit[:, 1]) < 0.35) & (t > 0)
    expected_r = np.clip(hit[inside, 0] + 0.5, 0, 1)
    # LANCZOS resampling + uint8 quantization → small tolerance
    assert np.abs(gt[inside, 0] - expected_r).mean() < 0.02


def test_sampling_modes():
    rng = np.random.RandomState(0)
    for mode in ("patch", "random", "random2"):
        pc = sample_pixels(mode, 8, 40, 30, rng)
        assert pc.shape == (8, 8, 2)
        assert pc[..., 0].max() < 40 and pc[..., 1].max() < 30
        assert pc.min() >= 0
    pc = sample_pixels("patch", 8, 40, 30, rng)
    # patch is contiguous
    assert np.allclose(np.diff(pc[0, :, 0]), 1.0)
    full = sample_pixels("", 0, 40, 30, rng)
    assert full.shape == (30, 40, 2)


def test_chunks_of_item(scene_dir):
    opt = make_opt(scene_dir)
    ds = create_dataset(opt, split="test")
    item = ds.get_item(0, full_img=True)
    R = item["raydir"].shape[1]
    seen = 0
    for sub, s, e in chunks_of_item(item, 300):
        assert sub["raydir"].shape == (1, 300, 3)
        np.testing.assert_array_equal(sub["raydir"][:, :e - s],
                                      item["raydir"][:, s:e])
        seen = e
    assert seen == R


def test_render_split_and_dummyrot(scene_dir):
    opt = make_opt(scene_dir)
    ds = create_dataset(opt, split="render")
    assert len(ds) == 20
    item = ds.get_dummyrot_item(3)
    assert item["raydir"].shape == (1, 40 * 40, 3)
    assert "gt_image" not in item
    # render poses sit on a radius-4 circle
    np.testing.assert_allclose(np.linalg.norm(item["campos"][0]), 4.0, rtol=1e-5)


def test_init_points_and_triplets(scene_dir):
    opt = make_opt(scene_dir)
    ds = create_dataset(opt, split="train")
    xyz = ds.load_init_points()
    assert xyz.shape == (900, 3)
    assert np.abs(xyz[:, 2]).max() < 0.05
    tris = ds.view_id_list
    assert len(tris) >= 3
    assert all(len(t) == 3 for t in tris)
    flat = {i for t in tris for i in t}
    assert flat <= set(range(12))


def test_bg_color_random(scene_dir):
    opt = make_opt(scene_dir, bg_color="random")
    ds = create_dataset(opt, split="train")
    rng = np.random.RandomState(0)
    bgs = {tuple(ds.get_item(0, rng=rng)["bg_color"][0]) for _ in range(20)}
    assert bgs == {(0.0, 0.0, 0.0), (1.0, 1.0, 1.0)}


def test_registry_unknown():
    with pytest.raises(KeyError):
        find_dataset_class_by_name("nope")


def test_item_gt_mask_depth_sampling(scene_dir):
    """gt_mask is sampled at the item's pixel coords when the bg loss items
    are enabled, and absent otherwise (batch pytree stability). Datasets
    whose self.depths are alpha masks (nerf_synth360_ft) must REJECT
    depth_loss_items instead of silently supervising depth toward mask
    values."""
    opt = make_opt(scene_dir)
    ds = create_dataset(opt, split="train")
    item = ds.get_item(0, rng=np.random.RandomState(0))
    assert "gt_mask" not in item and "gt_depth" not in item

    opt2 = make_opt(scene_dir,
                    bg_loss_items=("coarse_is_background",),
                    bg_loss_weights=(0.1,))
    ds2 = create_dataset(opt2, split="train")
    it2 = ds2.get_item(0, rng=np.random.RandomState(0))
    R = it2["raydir"].shape[1]
    assert it2["gt_mask"].shape == (1, R)
    assert "gt_depth" not in it2
    # mask values come from the alpha channel at the sampled pixels
    px = it2["pixel_idx"].reshape(-1, 2).astype(np.int64)
    want = (ds2.alphas[0][px[:, 1], px[:, 0]] > 0.5).astype(np.float32)
    np.testing.assert_array_equal(it2["gt_mask"].reshape(-1), want)
    # chunk splitting carries the new keys
    full = ds2.get_item(0, rng=np.random.RandomState(0), full_img=True)
    ch, _, _ = next(iter(chunks_of_item(full, 64)))
    assert ch["gt_mask"].shape == (1, 64)

    # nerf_synth360's depths are binary alpha masks, not metric depth
    opt3 = make_opt(scene_dir,
                    depth_loss_items=("coarse_depth",),
                    depth_loss_weights=(0.1,))
    ds3 = create_dataset(opt3, split="train")
    with pytest.raises(ValueError, match="metric"):
        ds3.get_item(0, rng=np.random.RandomState(0))


def test_dataset_import_error_surfaces(monkeypatch):
    """A genuine ImportError inside the dataset module the caller asked for
    re-raises with its own traceback instead of 'unknown dataset'; an
    ImportError in a SIBLING dataset stays non-fatal."""
    import importlib
    real = importlib.import_module

    def broken(name, package=None):
        if name.endswith("scannet_ft"):
            raise ImportError("No module named 'definitely_not_installed'")
        return real(name, package)

    monkeypatch.setattr(importlib, "import_module", broken)
    import pointnerf_tpu.data as D
    saved = dict(D._REGISTRY)
    D._REGISTRY.pop("scannet_ft", None)
    try:
        with pytest.raises(ImportError, match="definitely_not_installed"):
            find_dataset_class_by_name("scannet_ft")
        # sibling failure stays non-fatal for other dataset names
        assert find_dataset_class_by_name("nerf_synth360_ft") is not None
    finally:
        D._REGISTRY.update(saved)
