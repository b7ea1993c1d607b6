"""Conv nets for the MVS stack, as pure param-dict functions.

Reference architectures:
* official MVSNet FeatureNet / CostRegNet (depth_estimators/mvsnet.py:7-71,
  module.py:6-33) — BN+ReLU, stride-4 2D features, 3D U-Net over the cost
  volume with transposed-conv upsampling;
* MVSNeRF FPN FeatureNet (mvs/models.py:717-765) — InPlaceABN
  (= BN + LeakyReLU(0.01); the in-place trick is a CUDA memory hack with no
  TPU analog, plain BN is mathematically identical).

Weight layout mirrors torch (conv OIHW / OIDHW) so pretrained .pth checkpoints
import by key without transposes. BatchNorm: eval mode uses imported running
stats; train mode uses batch stats (running-stat tracking is not needed to
reproduce the reference results, which freeze the depth MVSNet at init time —
mvs_points_model.py:314 torch.no_grad).
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp


# --------------------------------------------------------------------- primitives
def init_conv(key, cin: int, cout: int, k: int, dims: int = 2,
              bias: bool = False) -> Dict:
    """torch Conv default init (kaiming_uniform a=sqrt(5)) on OIHW/OIDHW."""
    shape = (cout, cin) + (k,) * dims
    fan_in = cin * k ** dims
    bound = 1.0 / math.sqrt(fan_in)
    gain = math.sqrt(2.0 / (1 + 5.0))  # kaiming_uniform(a=sqrt(5))
    wbound = gain * math.sqrt(3.0 / fan_in)
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, shape, minval=-wbound, maxval=wbound,
                                 dtype=jnp.float32)}
    if bias:
        p["b"] = jax.random.uniform(kb, (cout,), minval=-bound, maxval=bound,
                                    dtype=jnp.float32)
    return p


def init_bn(c: int) -> Dict:
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def conv2d(p: Dict, x: jnp.ndarray, stride: int = 1, pad: int = 0) -> jnp.ndarray:
    """x: [N,C,H,W]; weight OIHW."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=[(pad, pad)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "b" in p:
        y = y + p["b"][None, :, None, None]
    return y


def conv3d(p: Dict, x: jnp.ndarray, stride: int = 1, pad: int = 1) -> jnp.ndarray:
    """x: [N,C,D,H,W]; weight OIDHW."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,) * 3,
        padding=[(pad, pad)] * 3,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    if "b" in p:
        y = y + p["b"][None, :, None, None, None]
    return y


def conv_transpose3d(p: Dict, x: jnp.ndarray, stride: int = 2, pad: int = 1,
                     output_pad: int = 1) -> jnp.ndarray:
    """torch ConvTranspose3d(k=3, stride, padding, output_padding); weight IODHW
    (torch transposed-conv layout). Implemented as an lhs-dilated convolution
    with the spatially-flipped kernel."""
    w = p["w"]                              # [I, O, kd, kh, kw]
    w = jnp.flip(w, axis=(-3, -2, -1))
    w = jnp.swapaxes(w, 0, 1)               # -> [O, I, ...]
    k = w.shape[-1]
    lo = k - 1 - pad
    hi = k - 1 - pad + output_pad
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1),
        padding=[(lo, hi)] * 3,
        lhs_dilation=(stride,) * 3,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    if "b" in p:
        y = y + p["b"][None, :, None, None, None]
    return y


def batch_norm(p: Dict, x: jnp.ndarray, training: bool, eps: float = 1e-5
               ) -> jnp.ndarray:
    """Channel dim = 1 ([N,C,...])."""
    axes = (0,) + tuple(range(2, x.ndim))
    if training:
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
    else:
        mean, var = p["mean"], p["var"]
    shape = (1, -1) + (1,) * (x.ndim - 2)
    xn = (x - mean.reshape(shape)) / jnp.sqrt(var.reshape(shape) + eps)
    return xn * p["scale"].reshape(shape) + p["bias"].reshape(shape)


def cbr(p: Dict, x, stride, pad, training, act="relu", dims=2):
    conv = conv2d if dims == 2 else conv3d
    y = batch_norm(p["bn"], conv(p["conv"], x, stride, pad), training)
    if act == "relu":
        return jax.nn.relu(y)
    if act == "leaky":  # InPlaceABN default: leaky_relu(0.01)
        return jax.nn.leaky_relu(y, 0.01)
    return y


def init_cbr(key, cin, cout, k=3, dims=2) -> Dict:
    return {"conv": init_conv(key, cin, cout, k, dims), "bn": init_bn(cout)}


# --------------------------------------------------- official MVSNet FeatureNet
# (depth_estimators/mvsnet.py:7-27): stride-4, 32ch output
_OFCL_FEAT_SPEC = [  # name, cin, cout, k, stride, pad
    ("conv0", 3, 8, 3, 1, 1), ("conv1", 8, 8, 3, 1, 1),
    ("conv2", 8, 16, 5, 2, 2), ("conv3", 16, 16, 3, 1, 1),
    ("conv4", 16, 16, 3, 1, 1), ("conv5", 16, 32, 5, 2, 2),
    ("conv6", 32, 32, 3, 1, 1),
]


def init_ofcl_featurenet(key) -> Dict:
    keys = jax.random.split(key, len(_OFCL_FEAT_SPEC) + 1)
    p = {name: init_cbr(keys[i], cin, cout, k)
         for i, (name, cin, cout, k, _, _) in enumerate(_OFCL_FEAT_SPEC)}
    p["feature"] = init_conv(keys[-1], 32, 32, 3, bias=True)
    return p


def ofcl_featurenet(p: Dict, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
    """x: [N,3,H,W] -> [N,32,H/4,W/4]."""
    for name, cin, cout, k, stride, pad in _OFCL_FEAT_SPEC:
        x = cbr(p[name], x, stride, pad, training)
    return conv2d(p["feature"], x, 1, 1)


# ----------------------------------------------------- official MVSNet CostRegNet
# (depth_estimators/mvsnet.py:29-71): 3D U-Net 32->8 with skip connections
def init_costregnet(key) -> Dict:
    spec = [("conv0", 32, 8, 1), ("conv1", 8, 16, 2), ("conv2", 16, 16, 1),
            ("conv3", 16, 32, 2), ("conv4", 32, 32, 1), ("conv5", 32, 64, 2),
            ("conv6", 64, 64, 1)]
    keys = jax.random.split(key, 11)
    p = {name: init_cbr(keys[i], cin, cout, 3, dims=3)
         for i, (name, cin, cout, _) in enumerate(spec)}
    for i, (name, cin, cout) in enumerate(
            [("conv7", 64, 32), ("conv9", 32, 16), ("conv11", 16, 8)]):
        kk = jax.random.split(keys[7 + i])[0]
        w = init_conv(kk, cin, cout, 3, dims=3)["w"]
        # torch ConvTranspose3d stores [I, O, kd, kh, kw]
        p[name] = {"conv": {"w": jnp.swapaxes(w, 0, 1)}, "bn": init_bn(cout)}
    p["prob"] = init_conv(keys[10], 8, 1, 3, dims=3, bias=True)
    return p


def costregnet(p: Dict, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
    """x: [N,32,D,H,W] -> cost logits [N,1,D,H,W]."""
    c0 = cbr(p["conv0"], x, 1, 1, training, dims=3)
    c2 = cbr(p["conv2"], cbr(p["conv1"], c0, 2, 1, training, dims=3),
             1, 1, training, dims=3)
    c4 = cbr(p["conv4"], cbr(p["conv3"], c2, 2, 1, training, dims=3),
             1, 1, training, dims=3)
    x = cbr(p["conv6"], cbr(p["conv5"], c4, 2, 1, training, dims=3),
            1, 1, training, dims=3)

    def up(pp, x):
        y = batch_norm(pp["bn"], conv_transpose3d(pp["conv"], x), training)
        return jax.nn.relu(y)

    x = c4 + up(p["conv7"], x)
    x = c2 + up(p["conv9"], x)
    x = c0 + up(p["conv11"], x)
    return conv3d(p["prob"], x, 1, 1)


# ----------------------------------------------------- MVSNeRF FPN FeatureNet
# (mvs/models.py:717-765), intermediate=True: returns [imgs, x1(8ch,H),
# x2(16ch,H/2), x3(32ch,H/4)] — the four layers query_embedding samples
_FPN_SPEC = {
    "conv0": [(3, 8, 3, 1, 1), (8, 8, 3, 1, 1)],
    "conv1": [(8, 16, 5, 2, 2), (16, 16, 3, 1, 1), (16, 16, 3, 1, 1)],
    "conv2": [(16, 32, 5, 2, 2), (32, 32, 3, 1, 1), (32, 32, 3, 1, 1)],
}


def init_fpn_featurenet(key) -> Dict:
    p = {}
    blocks = list(_FPN_SPEC.items())
    keys = jax.random.split(key, len(blocks) + 1)
    for bk, (bname, layers) in enumerate(blocks):
        lk = jax.random.split(keys[bk], len(layers))
        p[bname] = [init_cbr(lk[i], cin, cout, k)
                    for i, (cin, cout, k, _, _) in enumerate(layers)]
    p["toplayer"] = init_conv(keys[-1], 32, 32, 1, bias=True)
    return p


def fpn_featurenet(p: Dict, imgs: jnp.ndarray, training: bool = False
                   ) -> List[jnp.ndarray]:
    """imgs: [V,3,H,W] -> [imgs, x1 [V,8,H,W], x2 [V,16,H/2,W/2],
    x3 [V,32,H/4,W/4]] (mvs/models.py:748-757, intermediate path)."""
    x = imgs
    outs = [imgs]
    for bname, layers in _FPN_SPEC.items():
        for li, (cin, cout, k, stride, pad) in enumerate(layers):
            x = cbr(p[bname][li], x, stride, pad, training, act="leaky")
        outs.append(x)
    outs[-1] = conv2d(p["toplayer"], outs[-1], 1, 0)
    return outs


# -------------------------------------------------------------- torch import
def import_torch_convnet(sd: Dict, prefix: str = "") -> Dict:
    """Flat torch state dict -> nested param dict for the nets above.

    Maps '<name>.conv.weight' / '<name>.bn.{weight,bias,running_mean,
    running_var}' (official MVSNet ConvBnReLU naming) and bare
    '<name>.{weight,bias}' convs.
    """
    out: Dict = {}
    bn_map = {"weight": "scale", "bias": "bias",
              "running_mean": "mean", "running_var": "var"}
    for key, val in sd.items():
        if prefix and not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        if k.endswith("num_batches_tracked"):
            continue
        arr = jnp.asarray(np.asarray(val, np.float32))
        parts = k.split(".")
        d = out
        for seg in parts[:-2]:
            kk = int(seg) if seg.isdigit() else seg
            d = d.setdefault(kk, {})
        owner, leaf = parts[-2], parts[-1]
        if owner == "bn" or (leaf in bn_map and leaf.startswith("running")):
            d.setdefault("bn", {})[bn_map[leaf]] = arr
        elif owner == "conv":
            d.setdefault("conv", {})["w" if leaf == "weight" else "b"] = arr
        else:
            kk = int(owner) if owner.isdigit() else owner
            d.setdefault(kk, {})["w" if leaf == "weight" else "b"] = arr

    def listify(d):
        if not isinstance(d, dict):
            return d
        if d and all(isinstance(kk, int) for kk in d):
            return [listify(d[i]) for i in sorted(d)]
        return {kk: listify(v) for kk, v in d.items()}

    return listify(out)


def import_official_mvsnet(sd: Dict) -> Dict:
    """Official-MVSNet torch checkpoint -> init_mvsnet param tree.

    Accepts the exact artifact the reference depends on (MVSNet
    `model_000014.ckpt`, reference mvs_points_model.py:66-73 + lego.sh:31):
    `torch.save({'model': OrderedDict})` with DataParallel 'module.'
    prefixes — or a bare state dict. Deconv blocks (conv7/9/11 =
    Sequential(ConvTranspose3d, BN)) keep the torch IODHW weight layout that
    conv_transpose3d consumes directly.
    """
    if "model" in sd and hasattr(sd["model"], "items"):
        sd = sd["model"]
    flat = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        flat[k] = v

    feat_sd = {k[len("feature."):]: v for k, v in flat.items()
               if k.startswith("feature.")}
    cr_sd = {k[len("cost_regularization."):]: v for k, v in flat.items()
             if k.startswith("cost_regularization.")}
    assert feat_sd and cr_sd, sorted(flat)[:8]

    deconv_names = ("conv7", "conv9", "conv11")
    plain = {k: v for k, v in cr_sd.items()
             if k.split(".")[0] not in deconv_names}
    cost = import_torch_convnet(plain)
    bn_map = {"weight": "scale", "bias": "bias",
              "running_mean": "mean", "running_var": "var"}
    for name in deconv_names:
        block: Dict = {"conv": {}, "bn": {}}
        for k, v in cr_sd.items():
            parts = k.split(".")
            if parts[0] != name or parts[-1] == "num_batches_tracked":
                continue
            arr = jnp.asarray(np.asarray(v, np.float32))
            if parts[1] == "0":   # ConvTranspose3d (no bias in the official net)
                block["conv"]["w" if parts[2] == "weight" else "b"] = arr
            else:                  # BatchNorm3d
                block["bn"][bn_map[parts[2]]] = arr
        cost[name] = block
    return {"feature": import_torch_convnet(feat_sd),
            "cost_regularization": cost}


def import_mvsnerf_featurenet(sd: Dict, prefix: str = "") -> Dict:
    """MVSNeRF FPN FeatureNet torch state dict -> init_fpn_featurenet tree.

    Layout (reference mvs/models.py:717-765): conv0/1/2 Sequentials of
    ConvBnReLU(Conv2d bias=False + InPlaceABN) + a biased 1x1 toplayer; the
    reference's `{iter}_net_mvs.pth` carries it under a 'FeatureNet.' prefix.
    InPlaceABN buffers (weight/bias/running_mean/running_var) map exactly onto
    batch_norm's scale/bias/mean/var — BN + leaky_relu(0.01), eps 1e-5.
    """
    flat = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if prefix and not k.startswith(prefix):
            continue
        flat[k[len(prefix):]] = v
    assert flat, sorted(sd)[:8]
    return import_torch_convnet(flat)
