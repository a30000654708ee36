"""MoCo necks: pooled global embedding + multi-level feature passthrough.

Parity: reference mmaction/models/necks/base.py —
  - BaseMoCo      :9-24   GAP(last stage) embedding, features passthrough
  - MixBaseMoCo   :27-43  appends the embedding to the feature list
  - TPNMoCo       :136-175 TPNSingle pyramid; embedding pooled from the
                  *backbone* last stage when emb_from_bkb (mscl_r18 default)
  - TPNProjMoCo   :68-103  per-level 1x1 projections folding channel groups
                  into time

All return (x_emb (N, C), features list) — the reference's extra empty
loss dict is dropped (losses flow through heads only).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..builder import NECKS
from .fpn_video import TPNSingle


def gap3d(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool3d((1,1,1)) + flatten over NTHWC."""
    return x.mean(axis=(1, 2, 3))


@NECKS.register_module()
class BaseMoCo(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return gap3d(x[-1]), list(x)


@NECKS.register_module()
class MixBaseMoCo(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_emb = gap3d(x[-1])
        return x_emb, list(x) + [x_emb]


@NECKS.register_module()
class TPNMoCo(nn.Module):
    in_channels: Sequence[int] = (128, 256, 512)
    out_channels: int = 128
    fpn_cfg: Any = None
    temporal_modulation_cfg: Any = None
    sepc_cfg: Any = None
    reverse_st: bool = False
    emb_from_bkb: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        tpn = TPNSingle(list(self.in_channels), self.out_channels,
                        fpn_cfg=self.fpn_cfg,
                        temporal_modulation_cfg=self.temporal_modulation_cfg,
                        sepc_cfg=self.sepc_cfg, reverse_st=self.reverse_st,
                        dtype=self.dtype, name='tpn')
        if self.emb_from_bkb:
            x_emb = gap3d(x[-1])
            feats = tpn(x, train)
        else:
            feats = tpn(x, train)
            x_emb = gap3d(feats[-1])
        return x_emb, feats


@NECKS.register_module()
class TPNProjMoCo(nn.Module):
    """Temporal pooling + 1x1 projections that fold channel groups into
    the time axis (reference necks/base.py:68-103)."""
    dims_in: Sequence[int] = (128, 256, 512)
    dims_out: Sequence[int] = (128, 128, 128)
    temporal_sizes: Sequence[int] = (4, 2, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_emb = gap3d(x[-1])
        cur_rate = [self.temporal_sizes[0] // sz for sz in
                    self.temporal_sizes]
        num_out = len(self.dims_in)
        new_x = []
        for i in range(num_out):
            cur = x[i - num_out]
            # adaptive temporal avg-pool to temporal_sizes[i]
            n, t, h, w, c = cur.shape
            sz = self.temporal_sizes[i]
            if t != sz:
                cur = cur.reshape(n, sz, t // sz, h, w, c).mean(axis=2)
            mid = self.dims_in[i] // 2
            cur = nn.Conv(mid, (1, 1, 1), dtype=self.dtype,
                          name=f'proj{i}_0')(cur)
            cur = nn.relu(cur)
            cur = nn.Conv(self.dims_out[i] * cur_rate[i], (1, 1, 1),
                          dtype=self.dtype, name=f'proj{i}_1')(cur)
            # unfold channel groups into time: (n,t,h,w,r*c)->(n,t*r,h,w,c)
            n, t, h, w, rc = cur.shape
            r = cur_rate[i]
            cur = cur.reshape(n, t, h, w, r, rc // r)
            cur = jnp.moveaxis(cur, 4, 2).reshape(n, t * r, h, w, rc // r)
            new_x.append(cur)
        return x_emb, new_x


@NECKS.register_module()
class BaseMoCo_TwoR5(nn.Module):
    """Last stage is a (global, local) feature pair: pool the global one,
    pass the local one through (reference necks/base.py:46-65)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_g, x_l = x[-1]
        return gap3d(x_g), list(x[:-1]) + [x_l]


@NECKS.register_module()
class TPNProjMoCoV2(nn.Module):
    """TPNProjMoCo over a channel fraction per level (reference
    necks/base.py:105-133): take the first 1/chunk of channels before the
    per-level projection."""
    dims_in: Sequence[int] = (128, 256, 512)
    dims_out: Sequence[int] = (128, 128, 128)
    ft_ids: Sequence[int] = (0, 1, 2)
    temporal_sizes: Sequence[int] = (4, 2, 1)
    chunks: Sequence[int] = (1, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_emb = gap3d(x[-1])
        cur_rate = [self.temporal_sizes[0] // sz
                    for sz in self.temporal_sizes]
        num_out = len(self.ft_ids)
        new_x = []
        for i in self.ft_ids:
            cur = x[i - num_out]
            c = cur.shape[-1] // self.chunks[i]
            cur = cur[..., :c]
            n, t, h, w, _ = cur.shape
            sz = self.temporal_sizes[i]
            if t != sz:
                cur = cur.reshape(n, sz, t // sz, h, w, c).mean(axis=2)
            mid = self.dims_in[i] // 2
            cur = nn.Conv(mid, (1, 1, 1), dtype=self.dtype,
                          name=f'proj{i}_0')(cur)
            cur = nn.relu(cur)
            cur = nn.Conv(self.dims_out[i] * cur_rate[i], (1, 1, 1),
                          dtype=self.dtype, name=f'proj{i}_1')(cur)
            n, t, h, w, rc = cur.shape
            r = cur_rate[i]
            cur = cur.reshape(n, t, h, w, r, rc // r)
            cur = jnp.moveaxis(cur, 4, 2).reshape(n, t * r, h, w, rc // r)
            new_x.append(cur)
        return x_emb, new_x
