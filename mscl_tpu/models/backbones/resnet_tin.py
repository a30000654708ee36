"""ResNetTIN — Temporal Interlace Network backbone.

Parity: reference mmaction/models/backbones/resnet_tin.py:18-379 —
  - tin_shift: per-(sample, channel-group) integer temporal shift with
    zero padding (the mmcv CUDA op, here a masked take_along_axis)
  - linear_sampler (:18-66): floor/ceil shifts blended by the
    fractional offset
  - OffsetNet (:153-217): conv1d(C,1,3) -> fc(T,T) -> relu ->
    fc(T, groups) (bias init 0.5108) -> 4*(sigmoid-0.5) in (-2, 2)
  - WeightNet (:99-150): conv1d(C, groups, 3) -> 2*sigmoid in (0, 2)
  - TemporalInterlace (:219-306): first 1/shift_div channels are
    deformably shifted (deform_groups=2, offsets mirrored +/-) and
    gated; remaining channels pass through
  - ResNetTIN (:309-379): the interlace is applied to every residual
    block's input on the conv1 path only (CombineNet(tds, conv1.conv));
    the residual identity sees the raw input.

Layout: frames-as-batch (N*T, H, W, C) like the TSM/TANet backbones.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from .resnet2d import ARCH, BasicBlock2d, Bottleneck2d, ConvBN2d


def tin_shift(data: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """data (N, T, C, S), offset (N, G) ints; channel group g of sample n
    is shifted by offset[n, g] along T with zero padding (mmcv tin_shift
    semantics: out[n, t] = data[n, t - offset])."""
    n, t, c, s = data.shape
    g = offset.shape[1]
    fold = c // g
    # per-channel offset: (N, C)
    off_c = jnp.repeat(offset, fold, axis=1)
    t_idx = jnp.arange(t)[None, :, None]                 # (1, T, 1)
    src = t_idx - off_c[:, None, :]                      # (N, T, C)
    valid = (src >= 0) & (src < t)
    src = jnp.clip(src, 0, t - 1)
    out = jnp.take_along_axis(data, src[..., None], axis=1)
    return out * valid[..., None]


def linear_sampler(data: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """data (N, T, C, H, W), offset (N, G) float (reference :18-66)."""
    n, t, c, h, w = data.shape
    offset0 = jnp.floor(offset).astype(jnp.int32)
    offset1 = offset0 + 1
    flat = data.reshape(n, t, c, h * w)
    data0 = tin_shift(flat, offset0)
    data1 = tin_shift(flat, offset1)
    w0 = 1 - (offset - offset0.astype(offset.dtype))     # (N, G)
    g = offset.shape[1]
    w0 = jnp.repeat(w0, c // g, axis=1)[:, None, :, None]  # (N,1,C,1)
    out = w0 * data0 + (1 - w0) * data1
    return out.reshape(n, t, c, h, w)


class OffsetNet(nn.Module):
    groups: int
    num_segments: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (N, T, C) pooled descriptor
        n, t, _ = x.shape
        x = nn.Conv(1, (3,), padding=[(1, 1)], dtype=self.dtype,
                    name='conv')(x)[..., 0]              # (N, T)
        x = nn.relu(nn.Dense(t, dtype=self.dtype, name='fc1')(x))
        x = nn.Dense(self.groups,
                     bias_init=nn.initializers.constant(0.5108),
                     dtype=self.dtype, name='fc2')(x)    # (N, G)
        return 4.0 * (jax.nn.sigmoid(x) - 0.5)


class WeightNet(nn.Module):
    groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (N, T, C) -> (N, T, G) gate in (0, 2)
        x = nn.Conv(self.groups, (3,), padding=[(1, 1)],
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name='conv')(x)
        return 2.0 * jax.nn.sigmoid(x)


class TemporalInterlace(nn.Module):
    """reference resnet_tin.py:219-306 on (N*T, H, W, C) frames."""
    num_segments: int = 8
    shift_div: int = 4
    deform_groups: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        nt, h, w, c = x.shape
        t = self.num_segments
        n = nt // t
        num_folds = c // self.shift_div

        xd = x[..., :num_folds].reshape(n, t, h, w, num_folds)
        pooled = xd.mean(axis=(2, 3))                    # (N, T, F)

        offset = OffsetNet(self.deform_groups, t, dtype=self.dtype,
                           name='offset_net')(pooled)    # (N, G)
        weight = WeightNet(self.deform_groups, dtype=self.dtype,
                           name='weight_net')(pooled)    # (N, T, G)

        offset = jnp.concatenate([offset, -offset], axis=1)  # (N, 2G)
        xs = linear_sampler(jnp.moveaxis(xd, -1, 2), offset)  # (N,T,F,H,W)

        # gate: (N, T, G) -> per-channel (N, T, F). The reference
        # (:287-293) repeats the G gates as [g0, g1, g0, g1] over the
        # four offset groups (+o0, +o1, -o0, -o1) — i.e. the mirrored
        # -o shifts reuse the same gates — then spreads each over
        # num_folds/4 channels.
        gate = jnp.tile(weight, (1, 1, 2))               # (N, T, 2G)
        gate = jnp.repeat(gate, num_folds // (2 * self.deform_groups),
                          axis=2)                        # (N, T, F)
        xs = xs * gate[:, :, :, None, None]
        xs = jnp.moveaxis(xs, 2, -1).reshape(nt, h, w, num_folds)
        return jnp.concatenate([xs, x[..., num_folds:]], axis=-1)


class TINBlock(nn.Module):
    """Residual block with TemporalInterlace on the conv1 path only
    (reference CombineNet placement, resnet_tin.py:340-361)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    block_type: str = 'bottleneck'
    num_segments: int = 8
    shift_div: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = TemporalInterlace(self.num_segments, self.shift_div,
                              dtype=self.dtype, name='tin')(x)
        if self.block_type == 'basic':
            y = ConvBN2d(self.planes, (3, 3), (self.stride,) * 2, (1, 1),
                         dtype=self.dtype, name='conv1')(y, train)
            y = ConvBN2d(self.planes, (3, 3), (1, 1), (1, 1), relu=False,
                         dtype=self.dtype, name='conv2')(y, train)
            out_ch = self.planes
        else:
            y = ConvBN2d(self.planes, (1, 1), (1, 1), (0, 0),
                         dtype=self.dtype, name='conv1')(y, train)
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
class ResNetTIN(nn.Module):
    depth: int = 50
    num_segments: int = 8
    is_tin: bool = True
    shift_div: int = 4
    pretrained: Any = None
    norm_eval: bool = False
    norm_cfg: Any = None          # accepted cfg surface
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        train = train and not self.norm_eval
        block_type, blocks = ARCH[self.depth]
        expansion = 1 if block_type == 'basic' else 4
        x = ConvBN2d(64, (7, 7), (2, 2), (3, 3), dtype=self.dtype,
                     name='conv1')(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        in_planes = 64
        plain = BasicBlock2d if block_type == 'basic' else Bottleneck2d
        for i in range(4):
            planes = 64 * (2 ** i)
            stride0 = 1 if i == 0 else 2
            for b in range(blocks[i]):
                stride = stride0 if b == 0 else 1
                need_ds = (b == 0) and (stride != 1 or
                                        in_planes != planes * expansion)
                if self.is_tin:
                    x = TINBlock(planes, stride, need_ds, block_type,
                                 self.num_segments, self.shift_div,
                                 dtype=self.dtype,
                                 name=f'layer{i + 1}_{b}')(x, train)
                else:
                    x = plain(planes, stride, need_ds, dtype=self.dtype,
                              name=f'layer{i + 1}_{b}')(x, train)
                in_planes = planes * expansion
        return x
