"""ScanNet .sens exporter (data/scannet_download.py): binary parse + export
tree that data/scannet_ft.py loads end-to-end."""
import io
import os
import struct
import zlib

import numpy as np
import pytest

from pointnerf_tpu.data import scannet_download as sd


def _jpeg_bytes(rgb):
    import imageio.v2 as imageio
    buf = io.BytesIO()
    imageio.imwrite(buf, rgb, format="jpg")
    return buf.getvalue()


def make_sens(path, n=10, wh=(40, 30), seed=0):
    """Synthesize a v4 .sens: jpeg color + zlib uint16 depth frames."""
    rng = np.random.RandomState(seed)
    W, H = wh
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 35.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    poses, depths, colors = [], [], []
    with open(path, "wb") as f:
        f.write(struct.pack("I", 4))
        name = b"synthetic StructureSensor"
        f.write(struct.pack("Q", len(name)) + name)
        for m in (K, np.eye(4, dtype=np.float32), K, np.eye(4, dtype=np.float32)):
            f.write(np.asarray(m, np.float32).tobytes())
        f.write(struct.pack("i", 2))        # jpeg color
        f.write(struct.pack("i", 1))        # zlib_ushort depth
        f.write(struct.pack("IIII", W, H, W, H))
        f.write(struct.pack("f", 1000.0))   # depth_shift: mm
        f.write(struct.pack("Q", n))
        for i in range(n):
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, 3] = [i * 0.1, 0.0, 2.0]
            poses.append(c2w)
            rgb = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
            colors.append(rgb)
            cbytes = _jpeg_bytes(rgb)
            depth = rng.randint(300, 5000, (H, W)).astype(np.uint16)
            depths.append(depth)
            dbytes = zlib.compress(depth.tobytes())
            f.write(c2w.tobytes())
            f.write(struct.pack("QQQQ", i * 33, i * 33 + 1,
                                len(cbytes), len(dbytes)))
            f.write(cbytes + dbytes)
    return poses, depths, colors


def test_read_sens_header_and_frames(tmp_path):
    p = str(tmp_path / "scan.sens")
    poses, depths, _ = make_sens(p, n=4)
    sens = sd.read_sens(p)
    assert sens.sensor_name == "synthetic StructureSensor"
    assert sens.color_compression == "jpeg"
    assert sens.depth_compression == "zlib_ushort"
    assert (sens.color_width, sens.color_height) == (40, 30)
    assert sens.depth_shift == 1000.0
    assert len(sens.frames) == 4
    np.testing.assert_allclose(sens.frames[2].camera_to_world, poses[2])
    np.testing.assert_array_equal(sd.decode_depth(sens.frames[1], sens),
                                  depths[1])
    # frame_skip keeps every k-th frame
    assert len(sd.read_sens(p, frame_skip=2).frames) == 2


def test_read_sens_rejects_unknown_version(tmp_path):
    p = str(tmp_path / "bad.sens")
    with open(p, "wb") as f:
        f.write(struct.pack("I", 7))
    with pytest.raises(ValueError, match="version"):
        sd.read_sens(p)


def test_export_sens_tree_loads_in_scannet_dataset(tmp_path):
    import imageio.v2 as imageio
    scan = "scene0101_04"
    scan_dir = tmp_path / scan
    scan_dir.mkdir()
    sens_path = str(scan_dir / f"{scan}.sens")
    poses, depths, _ = make_sens(sens_path, n=10)
    exported = str(scan_dir / "exported")
    n = sd.export_sens(sens_path, exported)
    assert n == 10
    # exact depth roundtrip through 16-bit png
    d5 = imageio.imread(os.path.join(exported, "depth", "5.png"))
    np.testing.assert_array_equal(d5, depths[5])
    np.testing.assert_allclose(
        np.loadtxt(os.path.join(exported, "pose", "3.txt")), poses[3])
    K = np.loadtxt(os.path.join(exported, "intrinsic", "intrinsic_color.txt"))
    assert K[0, 0] == 35.0

    # the tree is exactly what the scannet_ft dataset expects
    from pointnerf_tpu.config import Options
    from pointnerf_tpu.data import create_dataset
    opt = Options(data_root=str(tmp_path), scan=scan,
                  dataset_name="scannet_ft", img_wh=(40, 30),
                  random_sample="random", random_sample_size=6,
                  near_plane=0.1, far_plane=8.0, bg_color="black",
                  ranges=(-100.0,) * 3 + (100.0,) * 3, test_num_step=5)
    ds = create_dataset(opt, split="train")
    item = ds.get_item(0, full_img=True)
    assert item["gt_image"].shape == (1, 40 * 30, 3)
    assert np.isfinite(item["gt_image"]).all()


def test_download_file_offline_graceful(tmp_path):
    out = str(tmp_path / "f.bin")
    ok = sd.download_file("http://127.0.0.1:1/nothing", out)
    assert ok is False
    assert not os.path.exists(out) and not os.path.exists(out + ".tmp")
    # pre-existing file short-circuits (no network touch)
    with open(out, "wb") as f:
        f.write(b"x")
    assert sd.download_file("http://127.0.0.1:1/nothing", out) is True


def test_main_requires_tos(tmp_path):
    with pytest.raises(SystemExit, match="TOS|terms|tos"):
        sd.main(["--out", str(tmp_path), "--id", "scene0000_00"])
