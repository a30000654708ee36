"""I3DHead — clip classification head.

Parity: reference mmaction/models/heads/i3d_head.py — optional spatial
avg-pool ('avg' | 'none'), dropout, fc init normal(0, 0.01). The MSCL
fine-tune configs use spatial_type='none' because the torchvision r3d_18
feature is already globally pooled (test_ssv2_r18.py:16-21).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..builder import HEADS
from .base import BaseHead


@HEADS.register_module()
class I3DHead(BaseHead):
    num_classes: int = 400
    in_channels: int = 2048
    loss_cls: Any = None
    spatial_type: str = 'avg'
    dropout_ratio: float = 0.5
    init_std: float = 0.01
    multi_class: bool = False
    label_smooth_eps: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (N, T, H, W, C) featmap or (N, C) pooled vector
        if self.spatial_type == 'avg' and x.ndim == 5:
            x = x.mean(axis=(1, 2, 3))
        elif x.ndim == 5:
            # 'none' with a featmap still needs flattening to (N, C):
            # torchvision backbones pool internally, mm2 ones don't
            x = x.mean(axis=(1, 2, 3))
        if self.dropout_ratio != 0:
            x = nn.Dropout(rate=self.dropout_ratio,
                           deterministic=not train)(x)
        cls_score = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(stddev=self.init_std),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, name='fc_cls')(x)
        return cls_score
