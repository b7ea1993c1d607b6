"""Headless viewer driver (run/visualize.py): loading, PLY, splatting, videos."""
import os

import numpy as np
import pytest

from pointnerf_tpu.run import visualize as vz


def _save_ckpt(path, xyz, rgb, conf):
    np.savez(path, **{
        "neural_points.xyz": xyz[None],
        "neural_points.points_color": rgb[None],
        "neural_points.points_conf": conf[None, :, None],
    })


def test_load_point_cloud_thresholds_conf(tmp_path):
    xyz = np.arange(15, dtype=np.float32).reshape(5, 3)
    rgb = np.full((5, 3), 0.5, np.float32)
    conf = np.array([0.9, 0.05, 0.8, 0.0, 0.95], np.float32)
    p = tmp_path / "100_net_ray_marching.npz"
    _save_ckpt(p, xyz, rgb, conf)
    x, c, cf = vz.load_point_cloud(str(p), thres=0.1)
    assert len(x) == 3
    np.testing.assert_array_equal(x, xyz[[0, 2, 4]])
    # dir form picks the latest step
    _save_ckpt(tmp_path / "50_net_ray_marching.npz", xyz, rgb, conf * 0)
    x2, _, _ = vz.load_point_cloud(str(tmp_path), thres=0.1)
    assert len(x2) == 3  # step 100 (conf kept), not step 50 (all zero)


def test_write_ply_roundtrip(tmp_path):
    xyz = np.random.RandomState(0).randn(7, 3).astype(np.float32)
    rgb = np.random.RandomState(1).rand(7, 3).astype(np.float32)
    p = str(tmp_path / "c.ply")
    vz.write_ply(p, xyz, rgb)
    with open(p, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    assert b"element vertex 7" in data[:end]
    rec = np.frombuffer(data[end:], dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
    np.testing.assert_allclose(rec["xyz"], xyz, rtol=1e-6)
    np.testing.assert_array_equal(
        rec["rgb"], np.clip(rgb * 255.0 + 0.5, 0, 255).astype(np.uint8))


def test_splat_render_occlusion_and_culling():
    H = W = 33
    focal = 30.0
    c2w = np.eye(4, dtype=np.float32)  # camera at origin looking down -z
    xyz = np.array([[0, 0, -2.0],      # far red point at center
                    [0, 0, -1.0],      # near green point at center (wins)
                    [0, 0, +1.0]],     # behind the camera (culled)
                   np.float32)
    rgb = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    img = vz.splat_render(xyz, rgb, c2w, H, W, focal, point_size=1)
    np.testing.assert_array_equal(img[H // 2, W // 2], [0, 1, 0])
    assert not np.any(np.all(img == [0, 0, 1], axis=-1))  # blue never drawn
    # empty pixels keep the background
    assert np.all(img[0, 0] == 1.0)


def test_orbit_pose_looks_at_center():
    center = np.array([1.0, 2.0, 3.0], np.float32)
    for az in (0.0, 1.3, 4.0):
        c2w = vz.orbit_pose(center, 5.0, az)
        eye = c2w[:3, 3]
        view_dir = -c2w[:3, 2]  # camera looks down its -z
        to_center = (center - eye) / np.linalg.norm(center - eye)
        np.testing.assert_allclose(view_dir, to_center, atol=1e-5)
        # rotation is orthonormal
        np.testing.assert_allclose(c2w[:3, :3] @ c2w[:3, :3].T, np.eye(3),
                                   atol=1e-5)


def test_main_turntable_and_ply(tmp_path):
    rng = np.random.RandomState(2)
    xyz = rng.randn(200, 3).astype(np.float32)
    rgb = rng.rand(200, 3).astype(np.float32)
    conf = np.full(200, 0.9, np.float32)
    _save_ckpt(tmp_path / "10_net_ray_marching.npz", xyz, rgb, conf)
    out = tmp_path / "vis"
    ply = tmp_path / "c.ply"
    vz.main(["--checkpoint", str(tmp_path), "--out", str(out),
             "--ply", str(ply), "--n_frames", "3", "--size", "64"])
    assert ply.exists()
    assert (out / "frame-0002.png").exists()
    assert (out / "turntable.mp4").exists() or (out / "turntable.gif").exists()


def test_render_grow(tmp_path):
    pts = tmp_path / "points"
    pts.mkdir()
    rng = np.random.RandomState(3)
    for step, n in [(100, 50), (200, 120)]:
        xyz = rng.randn(n, 3).astype(np.float32)
        rgb255 = rng.rand(n, 3).astype(np.float32) * 255.0
        np.savetxt(pts / f"{step}.txt",
                   np.concatenate([xyz, rgb255], axis=-1), fmt="%.6f")
    out = tmp_path / "vis"
    vid = vz.render_grow(str(pts), str(out), size=48)
    assert vid is not None and os.path.exists(vid)
    assert vz.render_grow(str(tmp_path / "empty"), str(out)) is None
