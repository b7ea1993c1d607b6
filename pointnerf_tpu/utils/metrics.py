"""Image quality metrics: PSNR / SSIM / RMSE (+ gated LPIPS).

Reference: run/evaluate.py:34-97 uses skimage compare_psnr / compare_ssim(win=11,
multichannel) / mean_squared_error and the lpips package (alex + vgg, v0.1).
skimage/lpips are not in this image, so PSNR/SSIM/RMSE are implemented here
(SSIM follows Wang et al. 2004 exactly as skimage does: uniform 11x11 window,
K1=0.01, K2=0.03, per-channel then averaged). LPIPS requires pretrained conv
weights which cannot be downloaded in this environment; `lpips_fn` returns None
unless a weights file is supplied (see docstring).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np
from scipy.ndimage import uniform_filter


def psnr(gt: np.ndarray, img: np.ndarray, data_range: float = 1.0) -> float:
    """Peak signal-to-noise ratio (reference: compare_psnr, evaluate.py:60)."""
    gt = np.asarray(gt, np.float64)
    img = np.asarray(img, np.float64)
    mse = np.mean((gt - img) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def rmse(gt: np.ndarray, img: np.ndarray) -> float:
    """Root mean squared error (reference: evaluate.py:79)."""
    return float(np.sqrt(np.mean((np.asarray(gt, np.float64)
                                  - np.asarray(img, np.float64)) ** 2)))


def _ssim_single(gt, img, win_size, data_range):
    """SSIM for one 2-D channel, skimage-compatible (uniform filter, crop edges)."""
    K1, K2 = 0.01, 0.03
    gt = np.asarray(gt, np.float64)
    img = np.asarray(img, np.float64)
    nd = gt.ndim
    NP = win_size ** nd
    cov_norm = NP / (NP - 1)  # sample covariance, as skimage

    filt = lambda a: uniform_filter(a, size=win_size)
    ux, uy = filt(gt), filt(img)
    uxx, uyy, uxy = filt(gt * gt), filt(img * img), filt(gt * img)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    R = data_range
    C1, C2 = (K1 * R) ** 2, (K2 * R) ** 2
    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)

    pad = (win_size - 1) // 2
    return float(S[pad:-pad or None, pad:-pad or None].mean())


def ssim(gt: np.ndarray, img: np.ndarray, win_size: int = 11,
         data_range: float = 1.0) -> float:
    """Multichannel SSIM (reference: compare_ssim(gt, img, 11, multichannel=True),
    evaluate.py:62)."""
    gt = np.asarray(gt)
    img = np.asarray(img)
    if gt.ndim == 2:
        return _ssim_single(gt, img, win_size, data_range)
    return float(np.mean([_ssim_single(gt[..., c], img[..., c], win_size, data_range)
                          for c in range(gt.shape[-1])]))


def lpips_fn(net: str = "alex", weights_path: Optional[str] = None):
    """Gated LPIPS: returns a callable (gt, img in [0,1] HWC) -> float, or None.

    The reference uses lpips.LPIPS(net='alex'/'vgg', version='0.1')
    (evaluate.py:42-46). Pretrained backbone weights cannot be fetched here
    (no network egress); supply `weights_path` pointing at a torch state dict
    for the lpips model to enable it.
    """
    if weights_path is None or not os.path.exists(weights_path):
        return None
    try:
        import lpips  # noqa
        import torch
        model = lpips.LPIPS(net=net, version="0.1",
                            pretrained=True, model_path=weights_path)

        def fn(gt, img):
            g = torch.from_numpy(np.asarray(gt, np.float32))[None].permute(0, 3, 1, 2)
            m = torch.from_numpy(np.asarray(img, np.float32))[None].permute(0, 3, 1, 2)
            return float(model(g * 2 - 1, m * 2 - 1).item())
        return fn
    except Exception:
        pass
    # jax-native LPIPS from a full torch state dict (see utils/lpips_jax.py
    # module docstring for the one-file drop that enables this)
    from .lpips_jax import lpips_fn_jax
    return lpips_fn_jax(weights_path)


def report_metrics(gt_dir: str, img_dir: str, out_dir: str,
                   metrics: Sequence[str] = ("psnr", "ssim", "rmse"),
                   img_str: str = "step-%04d-coarse_raycolor.png",
                   gt_str: str = "step-%04d-gt_image.png",
                   id_list: Optional[Sequence[int]] = None,
                   lpips_weights: Optional[Dict[str, str]] = None) -> Dict[str, float]:
    """Directory-level evaluation mirroring the reference CLI
    (reference: run/evaluate.py:34-97): per-image metric txt files + scores.txt.
    """
    import imageio.v2 as imageio

    if id_list is None:
        id_list = range(999)
    lpips_weights = lpips_weights or {}
    lp = {k: lpips_fn(k.replace("vgglpips", "vgg").replace("lpips", "alex"),
                      lpips_weights.get(k))
          for k in metrics if k in ("lpips", "vgglpips")}

    total: Dict[str, List[float]] = {}
    for i in id_list:
        ip = os.path.join(img_dir, img_str % i)
        gp = os.path.join(gt_dir, gt_str % i)
        if not (os.path.exists(ip) and os.path.exists(gp)):
            break
        img = np.asarray(imageio.imread(ip), np.float32) / 255.0
        gt = np.asarray(imageio.imread(gp), np.float32) / 255.0
        img, gt = img[..., :3], gt[..., :3]
        for key in metrics:
            if key == "psnr":
                val = psnr(gt, img)
            elif key == "ssim":
                val = ssim(gt, img, 11)
            elif key == "rmse":
                val = rmse(gt, img)
            elif key in ("lpips", "vgglpips"):
                if lp.get(key) is None:
                    continue
                val = lp[key](gt, img)
            else:
                raise NotImplementedError(key)
            total.setdefault(key, []).append(val)

    os.makedirs(out_dir, exist_ok=True)
    out_str = ""
    means = {}
    for key, vals in total.items():
        arr = np.asarray(vals).reshape(-1)
        np.savetxt(os.path.join(out_dir, key + ".txt"), arr)
        means[key] = float(arr.mean())
        out_str += key + ": %.6f\n" % means[key]
    # record metrics that were requested but skipped (e.g. LPIPS without a
    # local weights file) so quality tables are never silently incomplete
    skipped = [k for k in metrics if k not in total]
    for k in skipped:
        reason = "no weights file (see utils/lpips_jax.py docstring)" \
            if k in ("lpips", "vgglpips") else "no images"
        out_str += f"{k}: SKIPPED ({reason})\n"
    with open(os.path.join(out_dir, "scores.txt"), "w") as f:
        f.write(out_str)
    return means
