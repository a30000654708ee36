"""TPNSingle — single-tower temporal pyramid (flax, NTHWC).

Parity: reference mmaction/models/necks/fpn_video.py:8-136 — slice the last
num_tpn_stages backbone stages, FPN top-down fusion, optional per-stage
TemporalModulation (grouped 3x1x1 conv + temporal maxpool), optional SEPC.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..builder import NECKS
from ..common.tpu_conv import neck_conv
from .fpn import FPN, xavier_uniform
from .sepc import SEPC


class TemporalModulation(nn.Module):
    """Grouped temporal conv + ceil-mode temporal maxpool
    (reference fpn_video.py:8-40)."""
    out_channels: int
    downsample_scale: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # grouped (32) conv: stays on nn.Conv via neck_conv's eligibility
        # gate — ops.conv3d has no grouped path (docs/benchmark.md r4)
        x = neck_conv(self.out_channels, (3, 1, 1), strides=(1, 1, 1),
                      padding=(1, 0, 0), use_bias=False,
                      feature_group_count=32, kernel_init=xavier_uniform,
                      dtype=self.dtype, name='conv')(x)
        s = self.downsample_scale
        t = x.shape[1]
        pad_t = (-t) % s  # ceil_mode padding
        if pad_t:
            x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0), (0, 0), (0, 0)),
                        constant_values=-jnp.inf)
        n, tp, h, w, c = x.shape
        x = x.reshape(n, tp // s, s, h, w, c).max(axis=2)
        return x


class TPNSingle(nn.Module):
    """FPN + optional TemporalModulation + optional SEPC
    (reference fpn_video.py:43-136)."""
    in_channels: Sequence[int]
    out_channels: int
    fpn_cfg: Any = None
    temporal_modulation_cfg: Any = None
    sepc_cfg: Any = None
    aux_head_cfg: Any = None
    flow_type: str = 'top-down'
    reverse_st: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_stages = len(self.in_channels)
        x = list(x[-num_stages:])
        fpn_cfg = dict(self.fpn_cfg or
                       dict(fpn_kerne_size=(1, 3, 3)))
        fpn_cfg.pop('conv_cfg', None)  # always Conv3d on TPU
        fpn = FPN(list(self.in_channels), self.out_channels, num_stages,
                  dtype=self.dtype, name='fpn', **fpn_cfg)

        tm_cfg = self.temporal_modulation_cfg
        if self.reverse_st:
            outs = x
            if tm_cfg is not None:
                outs = [TemporalModulation(
                    self.in_channels[i], tm_cfg['downsample_scales'][i],
                    dtype=self.dtype, name=f'tm_{i}')(o, train)
                    for i, o in enumerate(outs)]
            outs = fpn(outs, train)
        else:
            outs = fpn(x, train)
            if tm_cfg is not None:
                outs = [TemporalModulation(
                    self.out_channels, tm_cfg['downsample_scales'][i],
                    dtype=self.dtype, name=f'tm_{i}')(o, train)
                    for i, o in enumerate(outs)]

        if self.sepc_cfg is not None:
            sepc_cfg = dict(self.sepc_cfg)
            sepc_cfg['in_channels'] = list(sepc_cfg.get(
                'in_channels', [self.out_channels] * num_stages))
            outs = SEPC(dtype=self.dtype, name='sepc', **sepc_cfg)(
                outs, train)
        return outs


NECKS.register_module(name='TPNSingle', module=TPNSingle)
