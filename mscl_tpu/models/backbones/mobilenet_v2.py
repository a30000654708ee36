"""MobileNetV2 (+TSM variant) for frame-based recognizers (flax, NHWC).

Parity: reference mmaction/models/backbones/mobilenet_v2.py and
mobilenet_v2_tsm.py — inverted-residual bottlenecks with the standard
(t, c, n, s) table; the TSM variant temporal-shifts the input of each
residual-connected block (shift_div=8).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from .resnet2d import temporal_shift
from .video_resnet import kaiming_normal_fan_out
from ...ops.split_bn import make_bn

# (expand_ratio, channels, num_blocks, stride)
ARCH = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride,) * 2,
                    padding=[(pad, pad)] * 2,
                    feature_group_count=self.groups, use_bias=False,
                    kernel_init=kaiming_normal_fan_out(),
                    dtype=self.dtype, name='conv')(x)
        x = make_bn(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn')(x)
        return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int = 1
    expand_ratio: int = 6
    shift: bool = False
    is_shift: bool = True          # reference cfg key gating the shift
    num_segments: int = 8
    shift_div: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        use_res = self.stride == 1 and in_c == self.out_channels
        hidden = int(round(in_c * self.expand_ratio))
        y = x
        if use_res and self.shift:
            y = temporal_shift(y, self.num_segments, self.shift_div)
        if self.expand_ratio != 1:
            y = _ConvBNReLU6(hidden, 1, dtype=self.dtype,
                             name='expand')(y, train)
        y = _ConvBNReLU6(hidden, 3, self.stride, groups=hidden,
                         dtype=self.dtype, name='depthwise')(y, train)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    kernel_init=kaiming_normal_fan_out(),
                    dtype=self.dtype, name='project')(y)
        y = make_bn(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         name='project_bn')(y)
        return x + y if use_res else y


@BACKBONES.register_module()
class MobileNetV2(nn.Module):
    pretrained: Any = None
    widen_factor: float = 1.0
    out_indices: Any = (7,)
    frozen_stages: int = -1
    norm_eval: bool = False
    shift: bool = False
    is_shift: bool = True          # reference cfg key gating the shift
    num_segments: int = 8
    shift_div: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = _make_divisible(32 * self.widen_factor)
        x = _ConvBNReLU6(c, 3, 2, dtype=self.dtype, name='conv1')(x,
                                                                  train)
        outs = []
        for i, (t, ch, n, s) in enumerate(ARCH):
            out_c = _make_divisible(ch * self.widen_factor)
            for b in range(n):
                x = InvertedResidual(
                    out_c, s if b == 0 else 1, t,
                    shift=self.shift and self.is_shift,
                    num_segments=self.num_segments,
                    shift_div=self.shift_div, dtype=self.dtype,
                    name=f'layer{i + 1}_{b}')(x, train)
            outs.append(x)
        last_c = _make_divisible(1280 * max(self.widen_factor, 1.0))
        x = _ConvBNReLU6(last_c, 1, dtype=self.dtype, name='conv2')(
            x, train)
        outs.append(x)
        picked = [outs[i] for i in self.out_indices]
        return picked[0] if len(picked) == 1 else picked


@BACKBONES.register_module()
class MobileNetV2TSM(MobileNetV2):
    """reference mobilenet_v2_tsm.py."""
    shift: bool = True
