"""ResNetAudio — 2D ResNet over (N, T, F, 1) spectrograms.

Parity: reference mmaction/models/backbones/resnet_audio.py:13-374 and
models/common/conv_audio.py:
  - ConvAudio: frequency/time-factorized conv pair ((k,1) and (1,k),
    each Conv+BN+ReLU) merged by 'concat' (2x channels) or 'sum'
  - Bottleneck2dAudio: 1x1 -> (factorized 3x3 ConvAudio 'concat' |
    plain 3x3) -> 1x1 with expansion 4; conv2 carries the stride
  - stem: ConvAudio(in, base_channels, conv1_kernel=9, op='sum')
  - arch 50/101/152, base_channels 32, factorize=(1, 1, 0, 0)

Layout: NHWC-style (N, T, F, C) channels-last for TPU.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from .video_resnet import kaiming_normal_fan_out
from ...ops.split_bn import make_bn

ARCH_AUDIO = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class ConvAudio(nn.Module):
    """Factorized (k,1)+(1,k) conv pair (reference conv_audio.py:9-110)."""
    features: int
    kernel: int = 3
    stride: int = 1
    op: str = 'concat'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def branch(kernel, pad, name):
            y = nn.Conv(self.features, kernel, strides=(self.stride,) * 2,
                        padding=pad, use_bias=False,
                        kernel_init=kaiming_normal_fan_out(),
                        dtype=self.dtype, name=f'{name}_conv')(x)
            y = make_bn(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'{name}_bn')(y)
            return nn.relu(y)

        k = self.kernel
        b1 = branch((k, 1), [(k // 2, k // 2), (0, 0)], 'conv_1')
        b2 = branch((1, k), [(0, 0), (k // 2, k // 2)], 'conv_2')
        if self.op == 'concat':
            return jnp.concatenate([b1, b2], axis=-1)
        return b1 + b2


class Bottleneck2dAudio(nn.Module):
    """reference resnet_audio.py:13-110."""
    planes: int
    stride: int = 2
    factorize: bool = True
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x

        def convbn(y, feat, kernel, stride, pad, name, act=True):
            y = nn.Conv(feat, kernel, strides=(stride,) * 2,
                        padding=pad, use_bias=False,
                        kernel_init=kaiming_normal_fan_out(),
                        dtype=self.dtype, name=f'{name}_conv')(y)
            y = make_bn(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'{name}_bn')(y)
            return nn.relu(y) if act else y

        out = convbn(x, self.planes, (1, 1), 1, [(0, 0), (0, 0)], 'conv1')
        if self.factorize:
            # ConvAudio concat without norm/act on the merge (reference
            # conv2 has norm_cfg=None, act_cfg=None after the factorized
            # pair — each branch keeps its own BN+ReLU)
            out = ConvAudio(self.planes, 3, self.stride, op='concat',
                            dtype=self.dtype, name='conv2')(out, train)
        else:
            out = nn.Conv(self.planes, (3, 3),
                          strides=(self.stride,) * 2,
                          padding=[(1, 1), (1, 1)], use_bias=False,
                          kernel_init=kaiming_normal_fan_out(),
                          dtype=self.dtype, name='conv2_conv')(out)
        out = convbn(out, self.planes * self.expansion, (1, 1), 1,
                     [(0, 0), (0, 0)], 'conv3', act=False)
        if self.downsample:
            residual = convbn(x, self.planes * self.expansion, (1, 1),
                              self.stride, [(0, 0), (0, 0)],
                              'downsample', act=False)
        return nn.relu(out + residual)


@BACKBONES.register_module()
class ResNetAudio(nn.Module):
    """reference resnet_audio.py:113-374 over (N, T, F, C) spectrograms."""
    depth: int = 50
    pretrained: Any = None
    in_channels: int = 1
    num_stages: int = 4
    base_channels: int = 32
    strides: Sequence[int] = (1, 2, 2, 2)
    conv1_kernel: int = 9
    conv1_stride: int = 1
    frozen_stages: int = -1
    factorize: Sequence[int] = (1, 1, 0, 0)
    norm_eval: bool = False
    zero_init_residual: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 4 and x.shape[1] == self.in_channels:
            # accept reference NCHW spectrograms
            x = jnp.transpose(x, (0, 2, 3, 1))
        x = ConvAudio(self.base_channels, self.conv1_kernel,
                      self.conv1_stride, op='sum', dtype=self.dtype,
                      name='conv1')(x, train)
        in_planes = self.base_channels
        blocks = ARCH_AUDIO[self.depth][:self.num_stages]
        for i, num_blocks in enumerate(blocks):
            planes = self.base_channels * (2 ** i)
            for b in range(num_blocks):
                stride = self.strides[i] if b == 0 else 1
                need_ds = (b == 0) and (stride != 1 or
                                        in_planes != planes * 4)
                x = Bottleneck2dAudio(
                    planes, stride, factorize=bool(self.factorize[i]),
                    downsample=need_ds, dtype=self.dtype,
                    name=f'layer{i + 1}_{b}')(x, train)
                in_planes = planes * 4
        return x


BACKBONES.register_module(module=ConvAudio)
