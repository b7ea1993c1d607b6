"""ScanNet scan downloader + native .sens exporter.

Covers (and extends) the reference's ``data/download-scannet.py``: that script
only fetches ``.sens`` archives from the TU Munich release server and leaves
the export to ScanNet's separate C++/Python SensReader, which the reference
assumes was run out-of-band to produce the ``exported/{color,pose,intrinsic,
depth}`` tree its ``scannet_ft_dataset`` reads. Here both halves live in one
module so a scan goes from server to trainable layout in one command:

    python -m pointnerf_tpu.data.scannet_download --tos-agreed \\
        --out /data/scannet --id scene0101_04 --export

* download: resumable (.tmp + rename), per-type file selection, graceful
  offline error. Requires ``--tos-agreed`` — the ScanNet data is released
  under a terms-of-service the user must accept at
  https://kaldir.vc.in.tum.de/scannet/ScanNet_TOS.pdf first.
* export: a pure-Python reader for the public ``.sens`` binary layout
  (version, sensor name, 4x4 color/depth intrinsics + extrinsics,
  compression tags, frame table of camera-to-world poses + jpeg color +
  zlib'd uint16 depth) writing exactly the tree ``data/scannet_ft.py:32-45``
  loads: color/{i}.jpg, depth/{i}.png (16-bit mm), pose/{i}.txt,
  intrinsic/intrinsic_{color,depth}.txt.
"""
from __future__ import annotations

import argparse
import os
import struct
import sys
import zlib
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

BASE_URL = "https://kaldir.vc.in.tum.de/scannet/"
RELEASE = "v2/scans"
TOS_URL = BASE_URL + "ScanNet_TOS.pdf"
DEFAULT_TYPES = [".sens"]
KNOWN_TYPES = [".sens", "_vh_clean_2.ply", "_vh_clean.ply",
               "_vh_clean_2.labels.ply", "_vh_clean_2.0.010000.segs.json",
               ".aggregation.json", ".txt"]

COLOR_COMPRESSION = {-1: "unknown", 0: "raw", 1: "png", 2: "jpeg"}
DEPTH_COMPRESSION = {-1: "unknown", 0: "raw_ushort", 1: "zlib_ushort",
                     2: "occi_ushort"}


# ------------------------------------------------------------------- download

def download_file(url: str, out_path: str) -> bool:
    """Fetch url -> out_path via a .tmp staging file; True if written/present."""
    import urllib.request
    if os.path.exists(out_path):
        return True
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tmp = out_path + ".tmp"
    try:
        urllib.request.urlretrieve(url, tmp)
    except Exception as e:  # noqa: BLE001 - surface any network failure
        if os.path.exists(tmp):
            os.remove(tmp)
        print(f"  FAILED {url}: {e}", file=sys.stderr)
        return False
    os.replace(tmp, out_path)
    return True


def download_scan(scan_id: str, out_dir: str,
                  file_types: Optional[List[str]] = None) -> bool:
    """Fetch the requested per-scan files into {out_dir}/{scan_id}/."""
    ok = True
    for ft in file_types or DEFAULT_TYPES:
        url = f"{BASE_URL}{RELEASE}/{scan_id}/{scan_id}{ft}"
        dst = os.path.join(out_dir, scan_id, scan_id + ft)
        print(f"  {url} -> {dst}")
        ok = download_file(url, dst) and ok
    return ok


# ------------------------------------------------------------------ .sens IO

@dataclass
class SensFrame:
    camera_to_world: np.ndarray          # [4,4] float32
    timestamp_color: int
    timestamp_depth: int
    color_data: bytes                    # jpeg/png bytes (or raw)
    depth_data: bytes                    # zlib'd (or raw) uint16 stream


@dataclass
class SensData:
    sensor_name: str
    intrinsic_color: np.ndarray          # [4,4]
    extrinsic_color: np.ndarray
    intrinsic_depth: np.ndarray
    extrinsic_depth: np.ndarray
    color_compression: str
    depth_compression: str
    color_width: int
    color_height: int
    depth_width: int
    depth_height: int
    depth_shift: float                   # depth png value = meters*depth_shift
    frames: List[SensFrame] = field(default_factory=list)


def _read_mat4(f) -> np.ndarray:
    return np.frombuffer(f.read(64), np.float32).reshape(4, 4).copy()


def read_sens(path: str, frame_skip: int = 1) -> SensData:
    """Parse the public .sens binary layout (header + frame table)."""
    with open(path, "rb") as f:
        version = struct.unpack("I", f.read(4))[0]
        if version != 4:
            raise ValueError(f"unsupported .sens version {version} in {path}")
        strlen = struct.unpack("Q", f.read(8))[0]
        name = f.read(strlen).decode("ascii", errors="replace")
        ic, ec = _read_mat4(f), _read_mat4(f)
        idp, edp = _read_mat4(f), _read_mat4(f)
        cc = COLOR_COMPRESSION[struct.unpack("i", f.read(4))[0]]
        dc = DEPTH_COMPRESSION[struct.unpack("i", f.read(4))[0]]
        cw, ch, dw, dh = struct.unpack("IIII", f.read(16))
        shift = struct.unpack("f", f.read(4))[0]
        n_frames = struct.unpack("Q", f.read(8))[0]
        out = SensData(name, ic, ec, idp, edp, cc, dc, cw, ch, dw, dh, shift)
        for i in range(n_frames):
            c2w = _read_mat4(f)
            ts_c, ts_d, nc, nd = struct.unpack("QQQQ", f.read(32))
            cbytes = f.read(nc)
            dbytes = f.read(nd)
            if i % frame_skip == 0:
                out.frames.append(SensFrame(c2w, ts_c, ts_d, cbytes, dbytes))
    return out


def decode_depth(frame: SensFrame, sens: SensData) -> np.ndarray:
    """Depth frame bytes -> [H,W] uint16 (millimetres at depth_shift=1000)."""
    if sens.depth_compression == "zlib_ushort":
        raw = zlib.decompress(frame.depth_data)
    elif sens.depth_compression == "raw_ushort":
        raw = frame.depth_data
    else:
        raise ValueError(
            f"unsupported depth compression {sens.depth_compression}")
    return np.frombuffer(raw, np.uint16).reshape(
        sens.depth_height, sens.depth_width).copy()


def export_sens(sens_path: str, out_dir: str, frame_skip: int = 1) -> int:
    """.sens -> exported/{color,pose,intrinsic,depth} (data/scannet_ft.py:32).

    Returns the number of frames written. Frame indices count the KEPT
    frames 0..n-1 (with frame_skip > 1 the exported ids stay contiguous,
    which is what the dataset's ``range(n_imgs)`` id list expects).
    """
    import imageio.v2 as imageio
    sens = read_sens(sens_path, frame_skip)
    for sub in ("color", "depth", "pose", "intrinsic"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    np.savetxt(os.path.join(out_dir, "intrinsic", "intrinsic_color.txt"),
               sens.intrinsic_color, fmt="%.6f")
    np.savetxt(os.path.join(out_dir, "intrinsic", "intrinsic_depth.txt"),
               sens.intrinsic_depth, fmt="%.6f")
    np.savetxt(os.path.join(out_dir, "intrinsic", "extrinsic_color.txt"),
               sens.extrinsic_color, fmt="%.6f")
    np.savetxt(os.path.join(out_dir, "intrinsic", "extrinsic_depth.txt"),
               sens.extrinsic_depth, fmt="%.6f")
    for i, fr in enumerate(sens.frames):
        np.savetxt(os.path.join(out_dir, "pose", f"{i}.txt"),
                   fr.camera_to_world, fmt="%.6f")
        cpath = os.path.join(out_dir, "color", f"{i}.jpg")
        if sens.color_compression == "jpeg":
            with open(cpath, "wb") as f:   # already jpeg: write bytes as-is
                f.write(fr.color_data)
        else:
            img = imageio.imread(fr.color_data)
            imageio.imwrite(cpath, img)
        imageio.imwrite(os.path.join(out_dir, "depth", f"{i}.png"),
                        decode_depth(fr, sens))
    return len(sens.frames)


# ----------------------------------------------------------------------- main

def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="dataset root directory")
    ap.add_argument("--id", action="append", default=[],
                    help="scan id, e.g. scene0101_04 (repeatable)")
    ap.add_argument("--scan_list", default=None,
                    help="text file with one scan id per line")
    ap.add_argument("--type", action="append", default=[],
                    help=f"file types to fetch, default .sens; known: "
                    f"{KNOWN_TYPES}")
    ap.add_argument("--tos-agreed", action="store_true",
                    help=f"confirm you accepted the ScanNet TOS ({TOS_URL})")
    ap.add_argument("--export", action="store_true",
                    help="also export downloaded .sens to exported/ trees")
    ap.add_argument("--frame_skip", type=int, default=1)
    args = ap.parse_args(argv)

    ids = list(args.id)
    if args.scan_list:
        with open(args.scan_list) as f:
            ids += [ln.strip() for ln in f if ln.strip()]
    if not ids:
        raise SystemExit("no scan ids given (--id / --scan_list)")
    types = args.type or DEFAULT_TYPES

    if not args.tos_agreed:
        raise SystemExit(
            "ScanNet is released under a terms-of-service agreement; read "
            f"{TOS_URL} and re-run with --tos-agreed")
    for sid in ids:
        print(f"downloading {sid} ...")
        download_scan(sid, args.out, types)
        sens_path = os.path.join(args.out, sid, sid + ".sens")
        if args.export and os.path.exists(sens_path):
            n = export_sens(sens_path,
                            os.path.join(args.out, sid, "exported"),
                            args.frame_skip)
            print(f"  exported {n} frames")


if __name__ == "__main__":
    main()
