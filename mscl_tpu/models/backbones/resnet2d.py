"""2D ResNet family for frame-based recognizers (flax, NHWC).

Parity: reference mmaction/models/backbones/resnet.py (torchvision
ResNet semantics; frames of a clip run as batch for TSN/TSM) and
resnet_tsm.py (Temporal Shift Module: shift 1/shift_div of channels
forward/backward in time before each residual block — zero-FLOP temporal
modeling, reference resnet_tsm.py TemporalShift).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from .video_resnet import kaiming_normal_fan_out
from ...ops.split_bn import make_bn

ARCH = {
    18: ('basic', (2, 2, 2, 2)),
    34: ('basic', (3, 4, 6, 3)),
    50: ('bottleneck', (3, 4, 6, 3)),
    101: ('bottleneck', (3, 4, 23, 3)),
    152: ('bottleneck', (3, 8, 36, 3)),
}


class ConvBN2d(nn.Module):
    features: int
    kernel: tuple = (3, 3)
    stride: tuple = (1, 1)
    padding: tuple = (1, 1)
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding=[(p, p) for p in self.padding], use_bias=False,
                    kernel_init=kaiming_normal_fan_out(),
                    dtype=self.dtype, name='conv')(x)
        x = make_bn(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn')(x)
        return nn.relu(x) if self.relu else x


def temporal_shift(x, num_segments, shift_div=8):
    """TSM shift over (N*T, H, W, C): 1/div channels shifted to t-1,
    1/div to t+1, zero-padded (reference resnet_tsm.py TemporalShift)."""
    nt, h, w, c = x.shape
    n = nt // num_segments
    x = x.reshape(n, num_segments, h, w, c)
    fold = c // shift_div
    left = jnp.concatenate(
        [x[:, 1:, ..., :fold],
         jnp.zeros_like(x[:, :1, ..., :fold])], axis=1)
    right = jnp.concatenate(
        [jnp.zeros_like(x[:, :1, ..., fold:2 * fold]),
         x[:, :-1, ..., fold:2 * fold]], axis=1)
    out = jnp.concatenate([left, right, x[..., 2 * fold:]], axis=-1)
    return out.reshape(nt, h, w, c)


class BasicBlock2d(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    shift: bool = False
    num_segments: int = 8
    shift_div: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = x
        if self.shift:
            y = temporal_shift(y, self.num_segments, self.shift_div)
        y = ConvBN2d(self.planes, (3, 3), (self.stride,) * 2, (1, 1),
                     dtype=self.dtype, name='conv1')(y, train)
        y = ConvBN2d(self.planes, (3, 3), (1, 1), (1, 1), relu=False,
                     dtype=self.dtype, name='conv2')(y, train)
        if self.downsample:
            residual = ConvBN2d(self.planes, (1, 1), (self.stride,) * 2,
                                (0, 0), relu=False, dtype=self.dtype,
                                name='downsample')(x, train)
        return nn.relu(y + residual)


class Bottleneck2d(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    shift: bool = False
    num_segments: int = 8
    shift_div: int = 8
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = x
        if self.shift:
            y = temporal_shift(y, self.num_segments, self.shift_div)
        y = ConvBN2d(self.planes, (1, 1), (1, 1), (0, 0),
                     dtype=self.dtype, name='conv1')(y, train)
        y = ConvBN2d(self.planes, (3, 3), (self.stride,) * 2, (1, 1),
                     dtype=self.dtype, name='conv2')(y, train)
        y = ConvBN2d(self.planes * 4, (1, 1), (1, 1), (0, 0), relu=False,
                     dtype=self.dtype, name='conv3')(y, train)
        if self.downsample:
            residual = ConvBN2d(self.planes * 4, (1, 1),
                                (self.stride,) * 2, (0, 0), relu=False,
                                dtype=self.dtype, name='downsample')(
                                    x, train)
        return nn.relu(y + residual)


@BACKBONES.register_module()
class ResNet(nn.Module):
    """2D ResNet over (N*T, H, W, C) frames."""
    depth: int = 50
    pretrained: Any = None
    in_channels: int = 3
    num_stages: int = 4
    out_indices: Sequence[int] = (3,)
    strides: Sequence[int] = (1, 2, 2, 2)
    frozen_stages: int = -1
    norm_eval: bool = False
    norm_cfg: Any = None        # accepted cfg surface (BN semantics fixed)
    partial_bn: bool = False
    shift: bool = False            # TSM
    is_shift: bool = True          # reference cfg key gating the shift
    num_segments: int = 8
    shift_div: int = 8
    # TSM non-local variants (reference resnet_tsm.py: NonLocal3d over
    # the segment axis) + temporal_pool (segment max-pool before layer2)
    non_local: Any = (0, 0, 0, 0)
    non_local_cfg: Any = None
    temporal_pool: bool = False
    dtype: Any = jnp.float32

    def _nl_flag(self, stage_idx, block_idx):
        spec = self.non_local
        if not spec:
            return False
        stage_spec = spec[stage_idx] if stage_idx < len(spec) else 0
        if isinstance(stage_spec, (list, tuple)):
            return bool(stage_spec[block_idx]) \
                if block_idx < len(stage_spec) else False
        return bool(stage_spec)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .resnet3d import NonLocal3d
        block_type, blocks = ARCH[self.depth]
        block_cls = BasicBlock2d if block_type == 'basic' else Bottleneck2d
        expansion = 1 if block_type == 'basic' else 4
        bn_train = train and not self.norm_eval
        x = ConvBN2d(64, (7, 7), (2, 2), (3, 3), dtype=self.dtype,
                     name='conv1')(x, bn_train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        outs = []
        in_planes = 64
        segs = self.num_segments
        for i in range(self.num_stages):
            if i == 1 and self.temporal_pool:
                # reference resnet_tsm.py TemporalPool (wraps layer2):
                # (3,1,1)/(2,1,1)/pad(1,0,0) max pool over segments
                nhw = x.shape[1:]
                xt = x.reshape((-1, segs) + nhw)
                xt = jnp.pad(xt, ((0, 0), (1, 1)) + ((0, 0),) * len(nhw),
                             constant_values=-jnp.inf)
                xt = jnp.maximum(jnp.maximum(xt[:, 0:-2:2], xt[:, 1:-1:2]),
                                 xt[:, 2::2])
                segs = segs // 2
                x = xt.reshape((-1,) + nhw)
            planes = 64 * (2 ** i)
            for b in range(blocks[i]):
                stride = self.strides[i] if b == 0 else 1
                need_ds = (b == 0) and (stride != 1 or
                                        in_planes != planes * expansion)
                x = block_cls(planes, stride, need_ds,
                              shift=self.shift and self.is_shift,
                              num_segments=segs,
                              shift_div=self.shift_div, dtype=self.dtype,
                              name=f'layer{i + 1}_{b}')(x, bn_train)
                in_planes = planes * expansion
                if self._nl_flag(i, b):
                    nl_cfg = dict(self.non_local_cfg or {})
                    nl_cfg.pop('norm_cfg', None)
                    nhw = x.shape[1:]
                    xt = x.reshape((-1, segs) + nhw)  # segs as T
                    xt = NonLocal3d(in_planes, dtype=self.dtype,
                                    name=f'layer{i + 1}_{b}_nonlocal',
                                    **nl_cfg)(xt, bn_train)
                    x = xt.reshape((-1,) + nhw)
            outs.append(x)
        outs = [outs[i] for i in self.out_indices]
        return outs[0] if len(outs) == 1 else outs


@BACKBONES.register_module()
class ResNetTSM(ResNet):
    """TSM backbone (reference resnet_tsm.py): ResNet with temporal
    shift before every residual block."""
    shift: bool = True


@BACKBONES.register_module()
class C3D(nn.Module):
    """C3D backbone (reference mmaction/models/backbones/c3d.py):
    VGG-style 3D convs over NTHWC clips."""
    pretrained: Any = None
    # accepted reference cfg surface (c3d_sports1m.py model keys;
    # conv/ReLU semantics fixed, dropout lives in the fc layers below)
    style: str = 'pytorch'
    conv_cfg: Any = None
    norm_cfg: Any = None
    act_cfg: Any = None
    dropout_ratio: float = 0.5
    init_std: float = 0.005
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(x, feat, name):
            x = nn.Conv(feat, (3, 3, 3), padding=[(1, 1)] * 3,
                        kernel_init=kaiming_normal_fan_out(),
                        dtype=self.dtype, name=name)(x)
            return nn.relu(x)

        def pool(x, t_stride):
            return nn.max_pool(x, (t_stride, 2, 2),
                               strides=(t_stride, 2, 2))

        x = conv(x, 64, 'conv1a')
        x = pool(x, 1)
        x = conv(x, 128, 'conv2a')
        x = pool(x, 2)
        x = conv(x, 256, 'conv3a')
        x = conv(x, 256, 'conv3b')
        x = pool(x, 2)
        x = conv(x, 512, 'conv4a')
        x = conv(x, 512, 'conv4b')
        x = pool(x, 2)
        x = conv(x, 512, 'conv5a')
        x = conv(x, 512, 'conv5b')
        return x
