"""TPN — the original two-flow Temporal Pyramid Network neck.

Parity: reference mmaction/models/necks/tpn.py (449 LoC, MM2 original):
spatial modulation (strided convs to the top resolution/width), per-level
temporal modulation (grouped conv + temporal maxpool at different rates),
top-down and bottom-up information flows, level fusion, final 1x1
projection, and an auxiliary classification head on the penultimate
backbone stage whose loss is returned alongside the features.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..builder import NECKS, build_loss
from .fpn import xavier_uniform
from .fpn_video import TemporalModulation
from ...ops.split_bn import make_bn


class _ConvBnRelu3d(nn.Module):
    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding=[(p, p) for p in self.padding],
                    feature_group_count=self.groups,
                    use_bias=False, kernel_init=xavier_uniform,
                    dtype=self.dtype, name='conv')(x)
        x = make_bn(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn')(x)
        return nn.relu(x)


class LevelFusion(nn.Module):
    """Per-level 1x1 reduce + concat + 1x1 fuse (reference tpn.py
    LevelFusion)."""
    mid_channels: Sequence[int] = (1024, 1024)
    out_channels: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        outs = []
        for i, x in enumerate(inputs):
            # reference LevelFusion DownSample: grouped (32) 1x1x1
            # conv-BN-ReLU, maxpool scale (1,1,1) = identity
            outs.append(_ConvBnRelu3d(self.mid_channels[i], groups=32,
                                      dtype=self.dtype,
                                      name=f'downsample_{i}')(x, train))
        x = jnp.concatenate(outs, axis=-1)
        return _ConvBnRelu3d(self.out_channels, dtype=self.dtype,
                             name='fusion')(x, train)


@NECKS.register_module()
class TPN(nn.Module):
    in_channels: Sequence[int] = (1024, 2048)
    out_channels: int = 1024
    spatial_modulation_cfg: Any = None
    temporal_modulation_cfg: Any = None
    upsample_cfg: Any = None
    downsample_cfg: Any = None
    level_fusion_cfg: Any = None
    aux_head_cfg: Any = None
    flow_type: str = 'cascade'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, labels=None):
        """x: backbone stage list; uses the last len(in_channels) stages.
        Returns (features, aux_losses)."""
        num = len(self.in_channels)
        feats = list(x[-num:])
        top_c = self.in_channels[-1]

        # spatial modulation: bring every level to the top level's
        # (channels, resolution) via strided 3x3 convs
        spatial = []
        for i, f in enumerate(feats):
            import math
            out = f
            factor = self.in_channels[-1] // self.in_channels[i]
            num_convs = int(math.log2(factor)) if factor > 1 else 0
            for j in range(num_convs):
                c = self.in_channels[i] * (2 ** (j + 1))
                out = _ConvBnRelu3d(c, (1, 3, 3), (1, 2, 2), (0, 1, 1),
                                    dtype=self.dtype,
                                    name=f'spatial_{i}_{j}')(out, train)
            spatial.append(out)

        # temporal modulation at per-level rates
        tm_cfg = self.temporal_modulation_cfg or dict(
            downsample_scales=(8, 8))
        scales = tm_cfg['downsample_scales'][:num]
        pyramid = [TemporalModulation(self.out_channels, s,
                                      dtype=self.dtype,
                                      name=f'tm_{i}')(f, train)
                   for i, (f, s) in enumerate(zip(spatial, scales))]

        # top-down flow (upsample coarser T into finer)
        if self.upsample_cfg is not None or self.flow_type == 'cascade':
            for i in range(num - 1, 0, -1):
                up = pyramid[i]
                rate = up.shape[1] and pyramid[i - 1].shape[1] // \
                    up.shape[1]
                if rate and rate > 1:
                    up = jnp.repeat(up, rate, axis=1)
                pyramid[i - 1] = pyramid[i - 1] + up
        td_fused = LevelFusion(
            (self.out_channels,) * num, self.out_channels * 2,
            dtype=self.dtype, name='level_fusion_td')(pyramid, train)

        # bottom-up flow: reference DownSample = learnable (3,1,1)
        # conv ('conv-pool' order, downsample_position='after') then a
        # temporal maxpool at the rate difference
        for i in range(0, num - 1):
            down = nn.Conv(self.out_channels, (3, 1, 1),
                           padding=[(1, 1), (0, 0), (0, 0)],
                           use_bias=False, kernel_init=xavier_uniform,
                           dtype=self.dtype,
                           name=f'downsample_op_{i}')(pyramid[i])
            rate = pyramid[i + 1].shape[1] and down.shape[1] // \
                pyramid[i + 1].shape[1]
            if rate and rate > 1:
                n, t, h, w, c = down.shape
                down = down.reshape(n, t // rate, rate, h, w, c).max(2)
            pyramid[i + 1] = pyramid[i + 1] + down
        bu_fused = LevelFusion(
            (self.out_channels,) * num, self.out_channels * 2,
            dtype=self.dtype, name='level_fusion_bu')(pyramid, train)

        fused = jnp.concatenate([td_fused, bu_fused], axis=-1)
        out = _ConvBnRelu3d(self.in_channels[-1], dtype=self.dtype,
                            name='pyramid_fusion')(fused, train)

        aux_losses: Dict = {}
        if self.aux_head_cfg is not None and labels is not None:
            cfg = dict(self.aux_head_cfg)
            weight = cfg.get('loss_weight', 0.5)
            # reference AuxHead: (1,3,3)/s(1,2,2) conv to 2x channels +
            # BN before pooling (tpn.py:198-258)
            feat = nn.Conv(x[-2].shape[-1] * 2, (1, 3, 3),
                           strides=(1, 2, 2),
                           padding=[(0, 0), (1, 1), (1, 1)],
                           use_bias=False, kernel_init=xavier_uniform,
                           dtype=self.dtype, name='aux_conv')(x[-2])
            feat = make_bn(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name='aux_bn')(feat)
            feat = feat.mean(axis=(1, 2, 3))
            feat = nn.Dropout(rate=0.5, deterministic=not train)(feat)
            score = nn.Dense(cfg.get('num_classes', 400),
                             kernel_init=nn.initializers.normal(0.01),
                             dtype=self.dtype, name='aux_fc')(feat)
            loss_fn = build_loss(dict(
                cfg.get('loss_cls') or dict(type='CrossEntropyLoss')))
            aux_losses['loss_aux'] = weight * loss_fn(
                score, labels.reshape(-1))
        return out, aux_losses
