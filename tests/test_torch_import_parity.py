"""Full-module forward parity of the torch-checkpoint importers against the
REFERENCE's own torch modules (VERDICT r2 item 5).

The reference code at /root/reference is instantiated directly (random
weights + randomized BN running stats), its state dict saved in the exact
layout the real artifacts use (`model_000014.ckpt`: {'model': OrderedDict}
with DataParallel 'module.' prefixes; `{iter}_net_mvs.pth`: 'FeatureNet.'
prefix), imported through our importers, and the two forwards compared.
This closes the "synthetic hand-built state dict" gap without needing the
real pretrained weight files (absent in this environment).

Missing native deps of the reference import chain (inplace_abn,
torch_scatter, torchvision) are stubbed: InPlaceABN == BatchNorm +
leaky_relu(0.01), which is exactly the semantics our importer assumes
(SURVEY.md §7.3 "InPlaceABN: plain BN+LeakyReLU ... it was a memory hack").
"""

import sys
import types
from collections import OrderedDict

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

RNG = np.random.RandomState(7)
REF = "/root/reference"


def _install_stubs():
    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")
        ts.scatter_min = ts.segment_coo = ts.scatter_mean = \
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
        sys.modules["torch_scatter"] = ts
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.ToTensor = lambda: None
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    if "warmup_scheduler" not in sys.modules:
        ws = types.ModuleType("warmup_scheduler")
        ws.GradualWarmupScheduler = object
        sys.modules["warmup_scheduler"] = ws
    if "kornia" not in sys.modules:
        ko = types.ModuleType("kornia")
        kou = types.ModuleType("kornia.utils")

        def create_meshgrid(height, width, normalized_coordinates=True,
                            device=None, dtype=None):
            ys = torch.linspace(-1, 1, height) if normalized_coordinates \
                else torch.arange(height, dtype=torch.float32)
            xs = torch.linspace(-1, 1, width) if normalized_coordinates \
                else torch.arange(width, dtype=torch.float32)
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            return torch.stack([gx, gy], dim=-1)[None]

        kou.create_meshgrid = create_meshgrid
        ko.utils = kou
        sys.modules["kornia"] = ko
        sys.modules["kornia.utils"] = kou
    if "inplace_abn" not in sys.modules:
        iabn = types.ModuleType("inplace_abn")

        class InPlaceABN(nn.modules.batchnorm._BatchNorm):
            """BN + leaky_relu(0.01): the param/buffer layout (weight, bias,
            running_mean, running_var) matches the real package's."""

            def __init__(self, num_features, eps=1e-5, momentum=0.1,
                         affine=True, activation="leaky_relu",
                         activation_param=0.01, **kw):
                super().__init__(num_features, eps, momentum, affine)
                self.activation_param = activation_param

            def _check_input_dim(self, x):
                pass

            def forward(self, x):
                y = F.batch_norm(x, self.running_mean, self.running_var,
                                 self.weight, self.bias, self.training,
                                 self.momentum, self.eps)
                return F.leaky_relu(y, self.activation_param)

        iabn.InPlaceABN = InPlaceABN
        iabn.InPlaceABNSync = InPlaceABN
        sys.modules["inplace_abn"] = iabn


def _ref_import(modname):
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib
    return importlib.import_module(modname)


def _randomize_bn_stats(net, rng):
    """Init running stats away from (0, 1) so eval-mode BN actually exercises
    the imported buffers."""
    for m in net.modules():
        if isinstance(m, nn.modules.batchnorm._BatchNorm):
            m.running_mean.copy_(torch.from_numpy(
                rng.uniform(-0.2, 0.2, m.running_mean.shape).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 1.5, m.running_var.shape).astype(np.float32)))


def _rel_proj_mats(V, K, rng):
    """Feature-resolution relative projections: ref view identity, others a
    small rotation + translation (same construction as
    test_mvs_pipeline.test_homo_warping_parity)."""
    mats = [np.eye(4, dtype=np.float32)]
    for i in range(1, V):
        ang = 0.05 * i
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = K @ R @ np.linalg.inv(K)
        m[:3, 3] = [0.2 * i, -0.1 * i, 0.03 * i]
        mats.append(m)
    return np.stack(mats)


def test_official_mvsnet_ckpt_roundtrip_parity():
    """Reference MVSNet (depth_estimators/mvsnet.py:88-143) -> state dict in
    the model_000014.ckpt layout -> import_official_mvsnet -> our
    mvsnet_forward matches the torch forward (depth, confidence, prob)."""
    from pointnerf_tpu.models.mvs.nets import import_official_mvsnet
    from pointnerf_tpu.models.mvs.mvsnet import mvsnet_forward

    ref = _ref_import("models.depth_estimators.mvsnet")
    torch.manual_seed(3)
    net = ref.MVSNet(refine=False)
    _randomize_bn_stats(net, RNG)
    net.eval()

    # the exact artifact layout: torch.save({'model': sd}) with DataParallel
    # 'module.' prefixes (reference mvs_points_model.py:66-73)
    sd = OrderedDict(("module." + k, v) for k, v in net.state_dict().items())
    params = import_official_mvsnet({"model": sd})

    V, H, W, D = 3, 32, 32, 8
    imgs = RNG.rand(V, 3, H, W).astype(np.float32)
    # feature maps are H/4: projections at feature scale
    Kf = np.array([[10.0, 0, 4.0], [0, 10.0, 4.0], [0, 0, 1]], np.float32)
    proj = _rel_proj_mats(V, Kf, RNG)
    dvals = np.linspace(2.0, 6.0, D).astype(np.float32)

    with torch.no_grad():
        t_depth, t_conf, _, t_prob = net(
            torch.from_numpy(imgs)[None],
            torch.from_numpy(proj)[None],
            torch.from_numpy(dvals)[None])

    j_depth, j_conf, j_prob = mvsnet_forward(
        params, jnp.asarray(imgs), jnp.asarray(proj[:, :3]),
        jnp.asarray(dvals))

    np.testing.assert_allclose(np.asarray(j_prob), t_prob[0].numpy(),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_depth), t_depth[0].numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(j_conf), t_conf[0].numpy(),
                               rtol=1e-3, atol=1e-4)


def test_mvsnerf_featurenet_ckpt_roundtrip_parity():
    """Reference MVSNeRF FPN FeatureNet (mvs/models.py:717-765, intermediate
    mode) -> state dict under the net_mvs 'FeatureNet.' prefix ->
    import_mvsnerf_featurenet -> our fpn_featurenet matches all 3 levels."""
    from pointnerf_tpu.models.mvs.nets import (fpn_featurenet,
                                               import_mvsnerf_featurenet)

    ref = _ref_import("models.mvs.models")
    torch.manual_seed(4)
    net = ref.FeatureNet(intermediate=True)
    _randomize_bn_stats(net, RNG)
    net.eval()

    sd = OrderedDict(
        ("FeatureNet." + k, v) for k, v in net.state_dict().items())
    params = import_mvsnerf_featurenet(sd, prefix="FeatureNet.")

    V, H, W = 2, 24, 32
    imgs = RNG.rand(V, 3, H, W).astype(np.float32)
    with torch.no_grad():
        t_outs = net(torch.from_numpy(imgs)[None])   # [x, x1, x2, x3]
    j_outs = fpn_featurenet(params, jnp.asarray(imgs))

    assert len(t_outs) == len(j_outs) == 4
    for lvl in range(1, 4):
        np.testing.assert_allclose(
            np.asarray(j_outs[lvl]), t_outs[lvl].numpy(),
            rtol=1e-4, atol=1e-5, err_msg=f"FPN level {lvl}")
