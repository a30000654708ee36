"""S3D backbone (separable 3D Inception) in flax, NTHWC.

Parity: reference mmaction/models/backbones/s3d.py (S3D-G without the
gating by default): Inception-V1 topology where every kxkxk conv is
factorized into a (1,k,k) spatial conv followed by a (k,1,1) temporal
conv, each with BN+ReLU.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from .video_resnet import ConvBN

# Inception block channel table (Mixed_3b .. Mixed_5c):
# (out_1x1, mid_3x3, out_3x3, mid_d3x3, out_d3x3, out_pool)
_INCEPTION = [
    ('3b', (64, 96, 128, 16, 32, 32)),
    ('3c', (128, 128, 192, 32, 96, 64)),
    ('pool', None),
    ('4b', (192, 96, 208, 16, 48, 64)),
    ('4c', (160, 112, 224, 24, 64, 64)),
    ('4d', (128, 128, 256, 24, 64, 64)),
    ('4e', (112, 144, 288, 32, 64, 64)),
    ('4f', (256, 160, 320, 32, 128, 128)),
    ('pool', None),
    ('5b', (256, 160, 320, 32, 128, 128)),
    ('5c', (384, 192, 384, 48, 128, 128)),
]


class SepConv3d(nn.Module):
    """(1,k,k) spatial then (k,1,1) temporal conv, BN+ReLU each."""
    features: int
    kernel: int = 3
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        st, ss = self.stride[0], self.stride[1]
        x = ConvBN(self.features, (1, k, k), (1, ss, ss),
                   (0, k // 2, k // 2), dtype=self.dtype,
                   name='conv_s')(x, train)
        x = ConvBN(self.features, (k, 1, 1), (st, 1, 1),
                   (k // 2, 0, 0), dtype=self.dtype,
                   name='conv_t')(x, train)
        return x


class InceptionS3D(nn.Module):
    cfg: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, m3, c3, md3, cd3, cp = self.cfg
        b0 = ConvBN(c1, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                    dtype=self.dtype, name='b0')(x, train)
        b1 = ConvBN(m3, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                    dtype=self.dtype, name='b1_reduce')(x, train)
        b1 = SepConv3d(c3, 3, dtype=self.dtype, name='b1')(b1, train)
        b2 = ConvBN(md3, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                    dtype=self.dtype, name='b2_reduce')(x, train)
        b2 = SepConv3d(cd3, 3, dtype=self.dtype, name='b2')(b2, train)
        b3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1),
                         padding=[(1, 1)] * 3)
        b3 = ConvBN(cp, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                    dtype=self.dtype, name='b3')(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


@BACKBONES.register_module()
class S3D(nn.Module):
    pretrained: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SepConv3d(64, 7, (2, 2, 2), dtype=self.dtype,
                      name='conv1')(x, train)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=[(0, 0), (1, 1), (1, 1)])
        x = ConvBN(64, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                   dtype=self.dtype, name='conv2b')(x, train)
        x = SepConv3d(192, 3, dtype=self.dtype, name='conv2c')(x, train)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=[(0, 0), (1, 1), (1, 1)])
        for name, cfg in _INCEPTION:
            if cfg is None:
                x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2),
                                padding=[(0, 0)] * 3)
            else:
                x = InceptionS3D(cfg, dtype=self.dtype,
                                 name=f'mixed_{name}')(x, train)
        return x
