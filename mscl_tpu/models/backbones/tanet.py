"""TANet — ResNet with Temporal Adaptive Modules (flax, NHWC frames).

Parity: reference mmaction/models/backbones/tanet.py (+ mmaction TAM):
each residual block's first conv is preceded by a TAM that (a) re-weights
frames with a per-video temporal attention (local branch: temporal convs
over the time axis) and (b) convolves each channel over time with a
video-adaptive kernel (global branch: FC -> softmax kernel of size
adaptive_kernel_size, applied depthwise along T).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from .resnet2d import ARCH, ConvBN2d
from ...ops.split_bn import make_bn


class TAM(nn.Module):
    num_segments: int = 8
    alpha: int = 2
    adaptive_kernel_size: int = 3
    beta: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (N*T, H, W, C)
        nt, h, w, c = x.shape
        t = self.num_segments
        n = nt // t
        xt = x.reshape(n, t, h, w, c)
        # global spatial pool -> (N, T, C)
        theta = xt.mean(axis=(2, 3))

        # global branch: adaptive per-channel temporal kernel
        # (reference tam.py G: Linear/BN/ReLU/Linear/Softmax, bias-free)
        g = jnp.swapaxes(theta, 1, 2).reshape(n * c, t)  # (N*C, T)
        g = nn.Dense(t * self.alpha, use_bias=False, dtype=self.dtype,
                     name='g_fc1')(g)
        g = nn.relu(
            make_bn(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name='g_bn')(g))
        g = nn.Dense(self.adaptive_kernel_size, use_bias=False,
                     dtype=self.dtype, name='g_fc2')(g)
        kernel = jax.nn.softmax(g, axis=-1)  # (N*C, K)

        # local branch: temporal attention over frames (reference tam.py
        # L: Conv1d k3 / BN / ReLU / Conv1d k1 / Sigmoid, bias-free)
        l = jnp.swapaxes(theta, 1, 2)  # (N, C, T)
        l = nn.Conv(c // self.beta, (3,), padding=[(1, 1)],
                    use_bias=False, dtype=self.dtype, name='l_conv1')(
                        jnp.swapaxes(l, 1, 2))      # (N, T, C//beta)
        l = nn.relu(
            make_bn(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name='l_bn')(l))
        l = nn.Conv(c, (1,), padding=[(0, 0)], use_bias=False,
                    dtype=self.dtype, name='l_conv2')(l)  # (N, T, C)
        attn = nn.sigmoid(l)
        xt = xt * attn[:, :, None, None, :]

        # depthwise adaptive temporal conv: per (video, channel) kernel
        k = self.adaptive_kernel_size
        pad = k // 2
        seq = jnp.moveaxis(xt, -1, 1).reshape(n * c, t, h * w)
        seq = jnp.pad(seq, ((0, 0), (pad, pad), (0, 0)))
        out = sum(kernel[:, i][:, None, None] * seq[:, i:i + t]
                  for i in range(k))
        out = out.reshape(n, c, t, h, w)
        out = jnp.moveaxis(out, 1, -1)
        return out.reshape(nt, h, w, c)


class TABlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    block_type: str = 'bottleneck'
    num_segments: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Reference TABlock (tanet.py:44-70): the TAM is embedded AFTER
        # the block's conv1 (so its width is conv1's output channels) and
        # the residual identity is the pre-TAM block input x. The
        # reference only implements the Bottleneck pattern; the basic
        # pattern here follows the same conv1->TAM placement.
        residual = x
        tam = TAM(num_segments=self.num_segments, dtype=self.dtype,
                  name='tam')
        if self.block_type == 'basic':
            y = ConvBN2d(self.planes, (3, 3), (self.stride,) * 2, (1, 1),
                         dtype=self.dtype, name='conv1')(x, train)
            y = tam(y, train)
            y = ConvBN2d(self.planes, (3, 3), (1, 1), (1, 1), relu=False,
                         dtype=self.dtype, name='conv2')(y, train)
            out_ch = self.planes
        else:
            y = ConvBN2d(self.planes, (1, 1), (1, 1), (0, 0),
                         dtype=self.dtype, name='conv1')(x, train)
            y = tam(y, train)
            y = ConvBN2d(self.planes, (3, 3), (self.stride,) * 2, (1, 1),
                         dtype=self.dtype, name='conv2')(y, train)
            y = ConvBN2d(self.planes * 4, (1, 1), (1, 1), (0, 0),
                         relu=False, dtype=self.dtype, name='conv3')(
                             y, train)
            out_ch = self.planes * 4
        if self.downsample:
            residual = ConvBN2d(out_ch, (1, 1), (self.stride,) * 2,
                                (0, 0), relu=False, dtype=self.dtype,
                                name='downsample')(x, train)
        return nn.relu(y + residual)


@BACKBONES.register_module()
class TANet(nn.Module):
    depth: int = 50
    num_segments: int = 8
    pretrained: Any = None
    tam_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_type, blocks = ARCH[self.depth]
        expansion = 1 if block_type == 'basic' else 4
        x = ConvBN2d(64, (7, 7), (2, 2), (3, 3), dtype=self.dtype,
                     name='conv1')(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        in_planes = 64
        for i in range(4):
            planes = 64 * (2 ** i)
            stride0 = 1 if i == 0 else 2
            for b in range(blocks[i]):
                stride = stride0 if b == 0 else 1
                need_ds = (b == 0) and (stride != 1 or
                                        in_planes != planes * expansion)
                x = TABlock(planes, stride, need_ds, block_type,
                            self.num_segments, dtype=self.dtype,
                            name=f'layer{i + 1}_{b}')(x, train)
                in_planes = planes * expansion
        return x
