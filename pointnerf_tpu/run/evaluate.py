"""Standalone metrics CLI over rendered-image directories.

Mirrors the reference's `run/evaluate.py` argument surface (-i/-g/-o/
-is/-gs/-l/-m, reference run/evaluate.py:20-31) on top of
utils.metrics.report_metrics. LPIPS variants activate when local weights
are supplied (no model download here — see utils/metrics.py::lpips_fn for
the expected file).

    python -m pointnerf_tpu.run.evaluate -i ckpt/lego/test_200000/images \
        -is "step-%04d-coarse_raycolor.png" -m psnr ssim rmse
"""

from __future__ import annotations

import argparse

from ..utils.metrics import report_metrics


def main(argv=None):
    p = argparse.ArgumentParser(description="compute scores")
    p.add_argument("-i", "--imgFolder", required=True,
                   help="folder with rendered images")
    p.add_argument("-g", "--gtFolder", default=None,
                   help="folder with gt images (default: imgFolder)")
    p.add_argument("-o", "--outFolder", default=None,
                   help="folder for metric txt outputs (default: imgFolder)")
    p.add_argument("-is", "--imgStr", default="step-%04d-coarse_raycolor.png")
    p.add_argument("-gs", "--gtStr", default="step-%04d-gt_image.png")
    p.add_argument("-l", "--id_list", nargs="+", type=int, default=None)
    p.add_argument("-m", "--metrics", nargs="+",
                   default=["psnr", "ssim", "rmse"])
    p.add_argument("--lpips_alex_weights", default=None,
                   help="local path to LPIPS-alex weights (enables 'lpips')")
    p.add_argument("--lpips_vgg_weights", default=None,
                   help="local path to LPIPS-vgg weights (enables 'vgglpips')")
    a = p.parse_args(argv)

    weights = {}
    if a.lpips_alex_weights:
        weights["lpips"] = a.lpips_alex_weights
    if a.lpips_vgg_weights:
        weights["vgglpips"] = a.lpips_vgg_weights

    scores = report_metrics(
        a.gtFolder or a.imgFolder, a.imgFolder, a.outFolder or a.imgFolder,
        metrics=tuple(a.metrics), img_str=a.imgStr, gt_str=a.gtStr,
        id_list=a.id_list, lpips_weights=weights or None)
    for k, v in scores.items():
        print(f"{k}: {v:.6f}")
    return scores


if __name__ == "__main__":
    main()
