"""X3D backbone (flax, NTHWC).

Parity: reference mmaction/models/backbones/x3d.py (524 LoC) — expanded
MobileNet-style video net: channelwise 3x3x3 depthwise convs inside
inverted bottlenecks with optional SE and swish, width/depth multipliers
gamma_w/gamma_b/gamma_d, stem with separated spatial/temporal conv.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from .video_resnet import kaiming_normal_fan_out
from ...ops.split_bn import make_bn


def _round_width(width, multiplier, min_width=8, divisor=8):
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    new_width = max(min_width,
                    int(width + divisor / 2) // divisor * divisor)
    if new_width < 0.9 * width:
        new_width += divisor
    return int(new_width)


def _round_repeats(repeats, multiplier):
    if not multiplier:
        return repeats
    return int(math.ceil(multiplier * repeats))


class SEModule(nn.Module):
    channels: int
    reduction: float = 0.0625
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        red = _round_width(self.channels, self.reduction)
        s = x.mean(axis=(1, 2, 3), keepdims=True)
        s = nn.Conv(red, (1, 1, 1), dtype=self.dtype, name='fc1')(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1, 1), dtype=self.dtype,
                    name='fc2')(s)
        return x * nn.sigmoid(s)


class BlockX3D(nn.Module):
    planes: int
    outplanes: int
    spatial_stride: int = 1
    se_ratio: float = 0.0625
    use_swish: bool = True
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(y, name):
            return make_bn(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)(y)

        residual = x
        y = nn.Conv(self.planes, (1, 1, 1), use_bias=False,
                    kernel_init=kaiming_normal_fan_out(),
                    dtype=self.dtype, name='conv1')(x)
        y = nn.relu(bn(y, 'bn1'))
        # depthwise 3x3x3
        y = nn.Conv(self.planes, (3, 3, 3),
                    strides=(1, self.spatial_stride, self.spatial_stride),
                    padding=[(1, 1)] * 3, feature_group_count=self.planes,
                    use_bias=False, kernel_init=kaiming_normal_fan_out(),
                    dtype=self.dtype, name='conv2')(y)
        y = bn(y, 'bn2')
        if self.se_ratio:
            y = SEModule(self.planes, self.se_ratio, dtype=self.dtype,
                         name='se')(y)
        y = y * nn.sigmoid(y) if self.use_swish else nn.relu(y)
        y = nn.Conv(self.outplanes, (1, 1, 1), use_bias=False,
                    kernel_init=kaiming_normal_fan_out(),
                    dtype=self.dtype, name='conv3')(y)
        y = bn(y, 'bn3')
        if self.downsample:
            residual = nn.Conv(self.outplanes, (1, 1, 1),
                               strides=(1, self.spatial_stride,
                                        self.spatial_stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample')(x)
            residual = bn(residual, 'downsample_bn')
        return nn.relu(y + residual)


@BACKBONES.register_module()
class X3D(nn.Module):
    gamma_w: float = 1.0
    gamma_b: float = 2.25
    gamma_d: float = 2.2
    pretrained: Any = None
    in_channels: int = 3
    base_channels: int = 24
    stage_blocks: Sequence[int] = (1, 2, 5, 3)
    spatial_strides: Sequence[int] = (2, 2, 2, 2)
    se_style: str = 'half'
    se_ratio: float = 0.0625
    use_swish: bool = True
    frozen_stages: int = -1
    norm_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        base = _round_width(self.base_channels, self.gamma_w)
        blocks = [_round_repeats(b, self.gamma_d)
                  for b in self.stage_blocks]

        def bn(y, name):
            return make_bn(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)(y)

        # stem: spatial conv then depthwise temporal conv
        x = nn.Conv(base, (1, 3, 3), strides=(1, 2, 2),
                    padding=[(0, 0), (1, 1), (1, 1)], use_bias=False,
                    kernel_init=kaiming_normal_fan_out(),
                    dtype=self.dtype, name='conv1_s')(x)
        x = nn.Conv(base, (5, 1, 1), padding=[(2, 2), (0, 0), (0, 0)],
                    feature_group_count=base, use_bias=False,
                    kernel_init=kaiming_normal_fan_out(),
                    dtype=self.dtype, name='conv1_t')(x)
        x = nn.relu(bn(x, 'bn1'))

        in_planes = base
        for i, num_blocks in enumerate(blocks):
            out_planes = _round_width(base * (2 ** i), 1.0)
            mid_planes = int(out_planes * self.gamma_b)
            for b in range(num_blocks):
                use_se = (self.se_style == 'all') or \
                    (self.se_style == 'half' and b % 2 == 0)
                stride = self.spatial_strides[i] if b == 0 else 1
                x = BlockX3D(
                    mid_planes, out_planes, stride,
                    se_ratio=self.se_ratio if use_se else 0.0,
                    use_swish=self.use_swish,
                    downsample=(b == 0 and (stride != 1 or
                                            in_planes != out_planes)),
                    dtype=self.dtype, name=f'layer{i + 1}_{b}')(x, train)
                in_planes = out_planes
        # conv5: expand
        x = nn.Conv(int(in_planes * self.gamma_b), (1, 1, 1),
                    use_bias=False, kernel_init=kaiming_normal_fan_out(),
                    dtype=self.dtype, name='conv5')(x)
        x = nn.relu(bn(x, 'bn5'))
        return x
