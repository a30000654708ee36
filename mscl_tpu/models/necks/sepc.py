"""Scale-Equalizing Pyramid Convolution in 3D (flax, NTHWC).

Parity: reference mmaction/models/necks/sepc.py — each pyramid level gets
Pconv[1](self) + Pconv[2](finer level, strided) + trilinear-upsampled
Pconv[0](coarser level); optional integrated BN across levels (iBN);
conv weights init normal(0, 0.01), zero bias.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import NECKS
from ..common.tpu_conv import neck_conv
from ...ops.split_bn import make_bn

pconv_init = nn.initializers.normal(stddev=0.01)


def trilinear_resize(x: jnp.ndarray, size: Tuple[int, int, int]
                     ) -> jnp.ndarray:
    """Trilinear (align_corners=False) resize of NTHWC over (T, H, W) —
    jax.image half-pixel convention matches torch align_corners=False."""
    n, _, _, _, c = x.shape
    return jax.image.resize(x, (n,) + tuple(size) + (c,), method='linear')


class PConv3D(nn.Module):
    """One pyramid-conv stage (reference sepc.py:57-135)."""
    out_channels: int = 256
    stride: Tuple[int, int, int] = (2, 1, 1)
    kernel_size: Sequence[int] = (3, 3, 3)
    dilation: Sequence[int] = (1, 1, 1)
    groups: Sequence[int] = (1, 1, 1)
    iBN: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        convs = []
        for j in range(3):
            k = self.kernel_size[j]
            d = self.dilation[j]
            pad = (k + (d - 1) * 2) // 2
            stride = self.stride if j == 2 else (1, 1, 1)
            # neck_conv: ops.conv3d path (TPU conv dispatch + the gidot
            # grad-input fix, docs/benchmark.md) when d==1 and groups==1;
            # nn.Conv otherwise
            convs.append(neck_conv(
                self.out_channels, (k, k, k), strides=stride,
                padding=(pad, pad, pad), kernel_dilation=(d, d, d),
                feature_group_count=self.groups[j],
                kernel_init=pconv_init, bias_init=nn.initializers.zeros,
                dtype=self.dtype, name=f'pconv{j}'))

        next_x = []
        for level, feature in enumerate(x):
            temp = convs[1](feature)
            if level > 0:
                temp = temp + convs[2](x[level - 1])
            if level < len(x) - 1:
                temp = temp + trilinear_resize(convs[0](x[level + 1]),
                                               temp.shape[1:4])
            next_x.append(temp)

        if self.iBN:
            # integrated BN: one BN over all levels' flattened positions
            # (reference sepc.py:138-148)
            bn = make_bn(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=self.dtype, name='ibn')
            shapes = [p.shape for p in next_x]
            flat = jnp.concatenate(
                [p.reshape(p.shape[0], -1, p.shape[-1]) for p in next_x],
                axis=1)
            flat = bn(flat)
            outs, off = [], 0
            for s in shapes:
                cnt = s[1] * s[2] * s[3]
                outs.append(flat[:, off:off + cnt].reshape(s))
                off += cnt
            next_x = outs
        return [nn.relu(p) for p in next_x]


class SEPC(nn.Module):
    """Stack of Pconv_num PConv3D stages (reference sepc.py:16-54)."""
    in_channels: Sequence[int] = (256, 256, 256)
    out_channels: int = 256
    stride: Tuple[int, int, int] = (2, 1, 1)
    iBN: bool = False
    Pconv_num: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert len(x) == len(self.in_channels)
        for i in range(self.Pconv_num):
            x = PConv3D(self.out_channels, self.stride, iBN=self.iBN,
                        dtype=self.dtype, name=f'pconv3d_{i}')(x, train)
        return x


NECKS.register_module(name='SEPC', module=SEPC)
