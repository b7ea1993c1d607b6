"""JAX-native LPIPS: state-dict loading + numerical parity vs a torch
re-expression of the LPIPS v0.1 forward (reference: run/evaluate.py:42-46).
Uses randomly initialized weights in the exact lpips-package state-dict
format — the real pretrained file is a drop-in (same keys)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pointnerf_tpu.utils.lpips_jax import (ALEX_CFG, load_lpips_params,
                                           lpips_distance, lpips_fn_jax)

RNG = np.random.RandomState(3)


def make_alex_state_dict():
    """Random weights with the lpips.LPIPS(net='alex').state_dict() layout."""
    sd = {
        "scaling_layer.shift": torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1),
        "scaling_layer.scale": torch.tensor([.458, .448, .450]).view(1, 3, 1, 1),
    }
    # torchvision alexnet.features conv indices: 0, 3, 6, 8, 10 — lpips slices
    # them as slice1=[0,1], slice2=[2..4], slice3=[5..7], slice4=[8,9],
    # slice5=[10,11]; state-dict keys keep the global feature indices.
    convs = [("net.slice1.0", 64, 3, 11), ("net.slice2.3", 192, 64, 5),
             ("net.slice3.6", 384, 192, 3), ("net.slice4.8", 256, 384, 3),
             ("net.slice5.10", 256, 256, 3)]
    for name, co, ci, k in convs:
        sd[name + ".weight"] = torch.tensor(
            RNG.randn(co, ci, k, k).astype(np.float32) * 0.05)
        sd[name + ".bias"] = torch.tensor(
            RNG.randn(co).astype(np.float32) * 0.05)
    for i, c in enumerate((64, 192, 384, 256, 256)):
        sd[f"lin{i}.model.1.weight"] = torch.tensor(
            np.abs(RNG.randn(1, c, 1, 1)).astype(np.float32) * 0.1)
    return sd


def torch_lpips_alex(sd, img0, img1):
    """Verbatim torch re-expression of LPIPS v0.1 alex forward."""
    def prep(im):
        x = torch.tensor(im, dtype=torch.float32).permute(2, 0, 1)[None] * 2 - 1
        return (x - sd["scaling_layer.shift"]) / sd["scaling_layer.scale"]

    def feats(x):
        taps = []
        w = lambda n: (sd[n + ".weight"], sd[n + ".bias"])
        x = F.relu(F.conv2d(x, *w("net.slice1.0"), stride=4, padding=2))
        taps.append(x)
        x = F.max_pool2d(x, 3, 2)
        x = F.relu(F.conv2d(x, *w("net.slice2.3"), padding=2))
        taps.append(x)
        x = F.max_pool2d(x, 3, 2)
        x = F.relu(F.conv2d(x, *w("net.slice3.6"), padding=1))
        taps.append(x)
        x = F.relu(F.conv2d(x, *w("net.slice4.8"), padding=1))
        taps.append(x)
        x = F.relu(F.conv2d(x, *w("net.slice5.10"), padding=1))
        taps.append(x)
        return taps

    f0, f1 = feats(prep(img0)), feats(prep(img1))
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        na = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        nb = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        d = (na - nb) ** 2
        lin = sd[f"lin{i}.model.1.weight"]
        total += float((d * lin).sum(1).mean())
    return total


def test_lpips_jax_parity(tmp_path):
    sd = make_alex_state_dict()
    path = str(tmp_path / "lpips_alex_full.pth")
    torch.save(sd, path)

    img0 = RNG.rand(64, 80, 3).astype(np.float32)
    img1 = np.clip(img0 + RNG.randn(64, 80, 3).astype(np.float32) * 0.1, 0, 1)

    fn = lpips_fn_jax(path)
    assert fn is not None
    got = fn(img0, img1)
    want = torch_lpips_alex(sd, img0, img1)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)

    assert fn(img0, img0) < 1e-8          # identical images → 0
    assert got > 0.0

    params = load_lpips_params(path)
    assert params["cfg"] == "alex" and len(params["convs"]) == 5


def test_lpips_gating(tmp_path):
    assert lpips_fn_jax(None) is None
    assert lpips_fn_jax(str(tmp_path / "missing.pth")) is None


def test_report_metrics_records_skips(tmp_path):
    """Requested-but-unavailable metrics land in scores.txt as SKIPPED."""
    import imageio.v2 as imageio
    from pointnerf_tpu.utils.metrics import report_metrics

    d = str(tmp_path)
    img = (RNG.rand(16, 16, 3) * 255).astype(np.uint8)
    imageio.imwrite(f"{d}/step-0000-coarse_raycolor.png", img)
    imageio.imwrite(f"{d}/step-0000-gt_image.png", img)
    means = report_metrics(d, d, d, ("psnr", "ssim", "rmse", "lpips"))
    assert "psnr" in means and "lpips" not in means
    scores = open(f"{d}/scores.txt").read()
    assert "lpips: SKIPPED" in scores
