"""Parity tests: our jax conv/BN/grid-sample/MVS nets vs torch ground truth.

The reference is torch; exact numeric parity of the primitives guarantees a
pretrained MVSNet .pth produces the same depth maps after import.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from pointnerf_tpu.ops.interp import (grid_sample_2d, resize_nearest,
                                      upsample2x_bilinear_ac)
from pointnerf_tpu.models.mvs import nets

RNG = np.random.RandomState(0)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_grid_sample_matches_torch():
    feat = RNG.randn(1, 5, 9, 7).astype(np.float32)
    grid = RNG.uniform(-1.3, 1.3, (1, 1, 50, 2)).astype(np.float32)
    for pad in ("zeros", "border"):
        want = F.grid_sample(torch.from_numpy(feat), torch.from_numpy(grid),
                             mode="bilinear", padding_mode=pad,
                             align_corners=True)
        got = grid_sample_2d(jnp.asarray(feat[0]), jnp.asarray(grid[0, 0]),
                             align_corners=True, padding_mode=pad)
        np.testing.assert_allclose(np.asarray(got), want[0, :, 0].T.numpy(),
                                   atol=1e-5, err_msg=pad)


def test_grid_sample_no_align_corners():
    feat = RNG.randn(1, 3, 8, 8).astype(np.float32)
    grid = RNG.uniform(-1.1, 1.1, (1, 1, 40, 2)).astype(np.float32)
    want = F.grid_sample(torch.from_numpy(feat), torch.from_numpy(grid),
                         mode="bilinear", padding_mode="zeros",
                         align_corners=False)
    got = grid_sample_2d(jnp.asarray(feat[0]), jnp.asarray(grid[0, 0]),
                         align_corners=False, padding_mode="zeros")
    np.testing.assert_allclose(np.asarray(got), want[0, :, 0].T.numpy(), atol=1e-5)


def test_resize_and_upsample():
    x = RNG.randn(1, 4, 6, 5).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(13, 11), mode="nearest")
    got = resize_nearest(jnp.asarray(x[0]), (13, 11))
    np.testing.assert_allclose(np.asarray(got), want[0].numpy(), atol=1e-6)

    want2 = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="bilinear",
                          align_corners=True)
    got2 = upsample2x_bilinear_ac(jnp.asarray(x[0]))
    np.testing.assert_allclose(np.asarray(got2), want2[0].numpy(), atol=1e-5)


def test_conv_transpose3d_matches_torch():
    tconv = tnn.ConvTranspose3d(6, 4, kernel_size=3, padding=1,
                                output_padding=1, stride=2, bias=False)
    x = RNG.randn(1, 6, 4, 5, 3).astype(np.float32)
    want = tconv(torch.from_numpy(x)).detach().numpy()
    p = {"w": t2j(tconv.weight)}
    got = nets.conv_transpose3d(p, jnp.asarray(x))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_batchnorm_modes():
    bn = tnn.BatchNorm2d(5)
    bn.running_mean.data = torch.from_numpy(RNG.randn(5).astype(np.float32))
    bn.running_var.data = torch.from_numpy(
        RNG.uniform(0.5, 2, 5).astype(np.float32))
    bn.weight.data = torch.from_numpy(RNG.randn(5).astype(np.float32))
    bn.bias.data = torch.from_numpy(RNG.randn(5).astype(np.float32))
    x = RNG.randn(2, 5, 4, 4).astype(np.float32)
    p = {"scale": t2j(bn.weight), "bias": t2j(bn.bias),
         "mean": t2j(bn.running_mean), "var": t2j(bn.running_var)}
    bn.eval()
    want = bn(torch.from_numpy(x)).detach().numpy()
    got = nets.batch_norm(p, jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    # train mode: batch statistics (torch uses biased var for normalization)
    bn.train()
    want_t = bn(torch.from_numpy(x)).detach().numpy()
    got_t = nets.batch_norm(p, jnp.asarray(x), training=True)
    np.testing.assert_allclose(np.asarray(got_t), want_t, atol=1e-4)


class TorchConvBnReLU(tnn.Module):
    def __init__(self, cin, cout, k=3, stride=1, pad=1, dims=2):
        super().__init__()
        conv = tnn.Conv2d if dims == 2 else tnn.Conv3d
        bnc = tnn.BatchNorm2d if dims == 2 else tnn.BatchNorm3d
        self.conv = conv(cin, cout, k, stride=stride, padding=pad, bias=False)
        self.bn = bnc(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchOfclFeatureNet(tnn.Module):
    """Replica of reference depth_estimators/mvsnet.py FeatureNet."""

    def __init__(self):
        super().__init__()
        self.conv0 = TorchConvBnReLU(3, 8, 3, 1, 1)
        self.conv1 = TorchConvBnReLU(8, 8, 3, 1, 1)
        self.conv2 = TorchConvBnReLU(8, 16, 5, 2, 2)
        self.conv3 = TorchConvBnReLU(16, 16, 3, 1, 1)
        self.conv4 = TorchConvBnReLU(16, 16, 3, 1, 1)
        self.conv5 = TorchConvBnReLU(16, 32, 5, 2, 2)
        self.conv6 = TorchConvBnReLU(32, 32, 3, 1, 1)
        self.feature = tnn.Conv2d(32, 32, 3, 1, 1)

    def forward(self, x):
        x = self.conv1(self.conv0(x))
        x = self.conv4(self.conv3(self.conv2(x)))
        return self.feature(self.conv6(self.conv5(x)))


def test_ofcl_featurenet_parity():
    torch.manual_seed(0)
    tnet = TorchOfclFeatureNet().eval()
    # randomize running stats so eval-mode BN is non-trivial
    for m in tnet.modules():
        if isinstance(m, (tnn.BatchNorm2d,)):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
            m.running_var.data = torch.rand_like(m.running_var) + 0.5
    p = nets.import_torch_convnet(tnet.state_dict())
    x = RNG.randn(2, 3, 32, 40).astype(np.float32)
    want = tnet(torch.from_numpy(x)).detach().numpy()
    got = nets.ofcl_featurenet(p, jnp.asarray(x), training=False)
    assert got.shape == (2, 32, 8, 10)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_costregnet_shapes():
    key = jax.random.PRNGKey(0)
    p = nets.init_costregnet(key)
    x = jnp.asarray(RNG.randn(1, 32, 16, 8, 8).astype(np.float32))
    out = nets.costregnet(p, x, training=False)
    assert out.shape == (1, 1, 16, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_fpn_featurenet_shapes():
    key = jax.random.PRNGKey(0)
    p = nets.init_fpn_featurenet(key)
    imgs = jnp.asarray(RNG.randn(3, 3, 32, 40).astype(np.float32))
    outs = nets.fpn_featurenet(p, imgs, training=True)
    assert len(outs) == 4
    assert outs[0].shape == (3, 3, 32, 40)
    assert outs[1].shape == (3, 8, 32, 40)
    assert outs[2].shape == (3, 16, 16, 20)
    assert outs[3].shape == (3, 32, 8, 10)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


class TorchConvBnReLU3D(tnn.Module):
    def __init__(self, cin, cout, k=3, stride=1, pad=1):
        super().__init__()
        self.conv = tnn.Conv3d(cin, cout, k, stride=stride, padding=pad,
                               bias=False)
        self.bn = tnn.BatchNorm3d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchCostRegNet(tnn.Module):
    """Replica of reference depth_estimators/mvsnet.py CostRegNet (:29-71)."""

    def __init__(self):
        super().__init__()
        self.conv0 = TorchConvBnReLU3D(32, 8)
        self.conv1 = TorchConvBnReLU3D(8, 16, stride=2)
        self.conv2 = TorchConvBnReLU3D(16, 16)
        self.conv3 = TorchConvBnReLU3D(16, 32, stride=2)
        self.conv4 = TorchConvBnReLU3D(32, 32)
        self.conv5 = TorchConvBnReLU3D(32, 64, stride=2)
        self.conv6 = TorchConvBnReLU3D(64, 64)

        def up(cin, cout):
            return tnn.Sequential(
                tnn.ConvTranspose3d(cin, cout, 3, padding=1,
                                    output_padding=1, stride=2, bias=False),
                tnn.BatchNorm3d(cout), tnn.ReLU(inplace=True))
        self.conv7 = up(64, 32)
        self.conv9 = up(32, 16)
        self.conv11 = up(16, 8)
        self.prob = tnn.Conv3d(8, 1, 3, stride=1, padding=1)

    def forward(self, x):
        conv0 = self.conv0(x)
        conv2 = self.conv2(self.conv1(conv0))
        conv4 = self.conv4(self.conv3(conv2))
        x = self.conv6(self.conv5(conv4))
        x = conv4 + self.conv7(x)
        x = conv2 + self.conv9(x)
        x = conv0 + self.conv11(x)
        return self.prob(x)


def test_official_mvsnet_checkpoint_roundtrip(tmp_path):
    """The exact artifact the reference finetune scripts load
    (torch.save({'model': DataParallel state dict}) — mvs_points_model.py
    :66-73) must import and reproduce both subnets' forward passes."""
    import os
    from collections import OrderedDict
    from pointnerf_tpu.run.common import load_pretrained_mvsnet

    torch.manual_seed(1)
    tfeat = TorchOfclFeatureNet().eval()
    tcost = TorchCostRegNet().eval()
    for m in list(tfeat.modules()) + list(tcost.modules()):
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
            m.running_var.data = torch.rand_like(m.running_var) + 0.5

    sd = OrderedDict()
    for k, v in tfeat.state_dict().items():
        sd[f"module.feature.{k}"] = v
    for k, v in tcost.state_dict().items():
        sd[f"module.cost_regularization.{k}"] = v
    path = os.path.join(str(tmp_path), "model_000014.ckpt")
    torch.save({"model": sd, "optimizer": {}}, path)

    params = load_pretrained_mvsnet(path)

    x2 = RNG.randn(2, 3, 32, 40).astype(np.float32)
    want = tfeat(torch.from_numpy(x2)).detach().numpy()
    got = nets.ofcl_featurenet(params["feature"], jnp.asarray(x2),
                               training=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    x3 = RNG.randn(1, 32, 16, 8, 8).astype(np.float32)
    want3 = tcost(torch.from_numpy(x3)).detach().numpy()
    got3 = nets.costregnet(params["cost_regularization"], jnp.asarray(x3),
                           training=False)
    np.testing.assert_allclose(np.asarray(got3), want3, atol=3e-4)
