"""Whole-network numeric parity: our flax r3d (torchvision semantics) vs
an independently hand-built torch implementation of the same architecture
with shared weights (eval mode). Catches any layout/padding/stride/BN
mismatch that single-op tests would miss."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from mscl_tpu.models import BACKBONES
from mscl_tpu.models.backbones.video_resnet import VideoResNet


def torch_basic_stem(cin, cout, kernel, stride, pad):
    return tnn.Sequential(
        tnn.Conv3d(cin, cout, kernel, stride=stride, padding=pad,
                   bias=False),
        tnn.BatchNorm3d(cout), tnn.ReLU())


class TorchBasicBlock(tnn.Module):
    """torchvision VideoResNet BasicBlock with Conv3DSimple."""

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Sequential(
            tnn.Conv3d(cin, planes, 3, stride=(stride,) * 3, padding=1,
                       bias=False),
            tnn.BatchNorm3d(planes), tnn.ReLU())
        self.conv2 = tnn.Sequential(
            tnn.Conv3d(planes, planes, 3, padding=1, bias=False),
            tnn.BatchNorm3d(planes))
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(cin, planes, 1, stride=(stride,) * 3,
                           bias=False),
                tnn.BatchNorm3d(planes))
        self.relu = tnn.ReLU()

    def forward(self, x):
        res = x
        out = self.conv2(self.conv1(x))
        if self.downsample is not None:
            res = self.downsample(x)
        return self.relu(out + res)


class TorchTinyR3D(tnn.Module):
    """2-stage slice of r3d_18 (stem + layer1(1 block) + layer2(1 block))
    — enough depth to exercise stem geometry, striding, residuals, BN."""

    def __init__(self, width=8):
        super().__init__()
        self.stem = torch_basic_stem(3, width, (3, 7, 7), (1, 2, 2),
                                     (1, 3, 3))
        self.layer1 = TorchBasicBlock(width, width, 1)
        self.layer2 = TorchBasicBlock(width, width * 2, 2)

    def forward(self, x):
        return self.layer2(self.layer1(self.stem(x)))


def copy_convbn(params, stats, torch_conv, torch_bn):
    torch_conv.weight.data = torch.from_numpy(
        np.transpose(np.asarray(params['conv']['kernel']),
                     (4, 3, 0, 1, 2)).copy())
    torch_bn.weight.data = torch.from_numpy(
        np.asarray(params['bn']['scale']).copy())
    torch_bn.bias.data = torch.from_numpy(
        np.asarray(params['bn']['bias']).copy())
    torch_bn.running_mean.data = torch.from_numpy(
        np.asarray(stats['bn']['mean']).copy())
    torch_bn.running_var.data = torch.from_numpy(
        np.asarray(stats['bn']['var']).copy())


def test_two_stage_r3d_matches_torch():
    rng = np.random.default_rng(0)
    width = 8
    model = VideoResNet(block='basic', conv_makers=('simple3d',) * 4,
                        layers=(1, 1, 1, 1), stem='r3d', base_width=width,
                        out_indices=(0, 1))
    x = rng.normal(size=(2, 6, 32, 32, 3)).astype(np.float32)
    with jax.default_matmul_precision('highest'):
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        # randomize BN stats so eval-mode normalization is non-trivial
        def randomize(stats):
            return jax.tree.map(
                lambda v: jnp.asarray(
                    rng.uniform(0.5, 1.5, v.shape).astype(np.float32)),
                stats)
        variables = {'params': variables['params'],
                     'batch_stats': randomize(variables['batch_stats'])}
        out_jax = model.apply(variables, jnp.asarray(x), train=False)

    tm = TorchTinyR3D(width).eval()
    p = jax.device_get(variables['params'])
    s = jax.device_get(variables['batch_stats'])
    copy_convbn(p['stem'], s['stem'], tm.stem[0], tm.stem[1])
    for jax_name, tblock in (('layer1_0', tm.layer1),
                             ('layer2_0', tm.layer2)):
        copy_convbn(p[jax_name]['conv1'], s[jax_name]['conv1'],
                    tblock.conv1[0], tblock.conv1[1])
        copy_convbn(p[jax_name]['conv2'], s[jax_name]['conv2'],
                    tblock.conv2[0], tblock.conv2[1])
        if 'downsample' in p[jax_name]:
            copy_convbn(p[jax_name]['downsample'],
                        s[jax_name]['downsample'],
                        tblock.downsample[0], tblock.downsample[1])

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # NCTHW
        out_t = tm(xt).permute(0, 2, 3, 4, 1).numpy()

    out2 = np.asarray(out_jax[1])
    assert out2.shape == out_t.shape
    np.testing.assert_allclose(out2, out_t, rtol=1e-3, atol=1e-3)
