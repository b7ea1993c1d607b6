"""JAX-native LPIPS (v0.1 semantics) activated by a local weights file.

The reference evaluates LPIPS with the `lpips` package (alex + vgg backbones,
reference: run/evaluate.py:42-46). That package and its pretrained weights
cannot be downloaded in this environment, so this module re-implements the
LPIPS v0.1 forward pass in pure JAX and loads weights from a torch state
dict on disk.

To enable LPIPS, drop ONE file per net (any machine with internet + lpips):

    import lpips, torch
    m = lpips.LPIPS(net="alex", version="0.1")   # or net="vgg"
    torch.save(m.state_dict(), "lpips_alex_full.pth")

and pass its path (``--lpips_alex_path`` / ``--lpips_vgg_path`` or the
``lpips_weights`` argument of ``report_metrics``). The state dict carries the
scaling layer, the torchvision backbone (``net.slice*``), and the linear
heads (``lin*.model.1.weight``) — everything needed; nothing is fetched.

LPIPS v0.1 forward (lpips/lpips.py):
  x, y in [-1, 1] -> scaling layer (x - shift) / scale -> backbone features
  at the 5 relu taps -> channel-unit-normalize -> squared diff -> 1x1 conv
  head -> spatial mean -> sum over taps.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# (out_channels, kernel, stride, pad) per conv; M = maxpool k3 s2 (alex) /
# k2 s2 (vgg). Tap after the listed relu. torchvision features indices match
# the lpips slices (lpips/pretrained_networks.py).
ALEX_CFG: List = [(64, 11, 4, 2), "TAP", "M", (192, 5, 1, 2), "TAP", "M",
                  (384, 3, 1, 1), "TAP", (256, 3, 1, 1), "TAP",
                  (256, 3, 1, 1), "TAP"]
VGG_CFG: List = [(64, 3, 1, 1), (64, 3, 1, 1), "TAP", "M",
                 (128, 3, 1, 1), (128, 3, 1, 1), "TAP", "M",
                 (256, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1), "TAP", "M",
                 (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1), "TAP", "M",
                 (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1), "TAP"]


def load_lpips_params(path: str) -> Optional[Dict]:
    """Torch LPIPS state dict -> numpy param dict, or None if unreadable."""
    if not path or not os.path.exists(path):
        return None
    try:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        return None
    np_sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    convs = sorted(
        (k for k in np_sd if k.startswith("net.") and k.endswith(".weight")),
        key=lambda k: (int(k.split(".")[1][5:]), int(k.split(".")[2])))
    params = {
        "shift": np_sd["scaling_layer.shift"].reshape(3),
        "scale": np_sd["scaling_layer.scale"].reshape(3),
        "convs": [(np_sd[k], np_sd[k[:-7] + ".bias"]) for k in convs],
        "lins": [np_sd[f"lin{i}.model.1.weight"].reshape(-1)
                 for i in range(sum(1 for k in np_sd
                                    if k.startswith("lin")
                                    and k.endswith("weight")))],
    }
    n_convs = len(params["convs"])
    params["cfg"] = "alex" if n_convs == 5 else "vgg"
    return params


def _conv(x, w, b, stride: int, pad: int):
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + jnp.asarray(b).reshape(1, -1, 1, 1)


def _maxpool(x, k: int, s: int):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dimensions=(1, 1, k, k),
        window_strides=(1, 1, s, s), padding="VALID")


def _features(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    cfg = ALEX_CFG if params["cfg"] == "alex" else VGG_CFG
    pool_k = 3 if params["cfg"] == "alex" else 2
    taps, ci = [], 0
    for item in cfg:
        if item == "M":
            x = _maxpool(x, pool_k, 2)
        elif item == "TAP":
            taps.append(x)
        else:
            _, k, s, p = item
            w, b = params["convs"][ci]
            ci += 1
            x = jax.nn.relu(_conv(x, w, b, s, p))
    return taps


def lpips_distance(params: Dict, img0: jnp.ndarray, img1: jnp.ndarray
                   ) -> jnp.ndarray:
    """LPIPS between two [H,W,3] images in [0,1] (v0.1 semantics)."""
    def prep(im):
        x = im.astype(jnp.float32) * 2.0 - 1.0          # [-1,1], HWC
        x = jnp.transpose(x, (2, 0, 1))[None]           # NCHW
        shift = jnp.asarray(params["shift"]).reshape(1, 3, 1, 1)
        scale = jnp.asarray(params["scale"]).reshape(1, 3, 1, 1)
        return (x - shift) / scale

    f0 = _features(params, prep(img0))
    f1 = _features(params, prep(img1))
    total = jnp.float32(0.0)
    for t0, t1, lin in zip(f0, f1, params["lins"]):
        n0 = t0 / jnp.sqrt(jnp.sum(t0 * t0, 1, keepdims=True) + 1e-10)
        n1 = t1 / jnp.sqrt(jnp.sum(t1 * t1, 1, keepdims=True) + 1e-10)
        d = jnp.square(n0 - n1)                          # [1,C,h,w]
        w = jnp.asarray(lin).reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(d * w, axis=1))
    return total


def lpips_fn_jax(weights_path: Optional[str]):
    """(gt, img [0,1] HWC) -> float, or None when the weights file is absent."""
    params = load_lpips_params(weights_path) if weights_path else None
    if params is None:
        return None
    dist = jax.jit(lambda a, b: lpips_distance(params, a, b))

    def fn(gt, img):
        return float(dist(jnp.asarray(gt, jnp.float32),
                          jnp.asarray(img, jnp.float32)))
    return fn
