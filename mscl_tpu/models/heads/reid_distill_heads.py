"""Reid / distill heads (MSCL ablation surface).

Parity targets:
  - TSMReidSimpleHead / FGTSMReidSimpleHead  reference heads/reid_head.py
  - TSMHead3D                                reference heads/tsm_head.py
  - RcMoDistHead                             reference heads/distill_head.py
Note: the reference's reid heads default to ``loss_reid=dict(
type='TripletLoss')`` but ship no TripletLoss anywhere in the repo —
registering one (losses/triplet_loss.py) fixes that gap, mirroring the
MSCLWithAugPosHeadV2 registration fix.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import HEADS, build_loss
from .base import BaseHead, topk_accuracy


def _cosface_logits(feat, weight, s, m, labels=None, eps=1e-8):
    """Normalized-cosine logits with additive margin on the target class
    (reference reid_head.py _refine_logits)."""
    ip = feat @ weight.T
    w1 = jnp.linalg.norm(feat, axis=1)
    w2 = jnp.linalg.norm(weight, axis=1)
    r_logits = ip / jnp.clip(jnp.outer(w1, w2), eps, None)
    if labels is None:
        one_hot = 0.0
    else:
        one_hot = jax.nn.one_hot(labels, weight.shape[0])
    return s * (r_logits - one_hot * m)


class _ReidHeadBase(BaseHead):
    """Shared reid-head machinery: consensus over segments, optional
    cosface scoring, triplet reid loss over the pooled feature."""
    num_classes: int = 400
    in_channels: int = 2048
    loss_cls: Any = None
    loss_reid: Any = None
    num_segments: int = 8
    spatial_type: str = 'avg'
    consensus: Any = None
    dropout_ratio: float = 0.8
    init_std: float = 0.001
    is_shift: bool = True
    temporal_pool: bool = False
    use_cosface: Any = None
    dtype: Any = jnp.float32

    def _segments(self):
        if self.is_shift and self.temporal_pool:
            return self.num_segments // 2
        return self.num_segments

    def _cosface(self):
        cfg = self.use_cosface or dict(use=False)
        return cfg.get('use', False), cfg.get('s', 64), cfg.get('m', 0.1)

    def _score(self, feat, train, labels=None):
        use_cf, s, m = self._cosface()
        kernel = self.param(
            'fc_cls_kernel', nn.initializers.normal(self.init_std),
            (feat.shape[-1], self.num_classes))
        bias = self.param('fc_cls_bias', nn.initializers.zeros,
                          (self.num_classes,))
        if use_cf:
            # margin needs the targets; applied when the caller passes
            # labels (the reference defers to loss() with a stored
            # weight — same math, different plumbing)
            return _cosface_logits(feat, kernel.T, s, m,
                                   labels if train else None)
        return feat @ kernel + bias

    def loss(self, cls_score, labels, **kwargs):
        feat = kwargs.pop('reid_feat', None)
        losses = {}
        if labels.ndim == 1:
            for k in self.topk:
                if k <= cls_score.shape[-1]:
                    losses[f'top{k}_acc'] = topk_accuracy(
                        cls_score, labels, k)
        loss_fn = self._build_loss()
        losses['loss_cls'] = loss_fn(cls_score, labels)
        if feat is not None:
            reid_fn = build_loss(dict(self.loss_reid or
                                      dict(type='TripletLoss')))
            losses['loss_reid'] = reid_fn(feat, labels)
        return losses


@HEADS.register_module()
class TSMReidSimpleHead(_ReidHeadBase):
    """TSM head + BN-neck + triplet reid loss (reference
    reid_head.py:11-175)."""
    use_bnneck: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, num_segs: int = None,
                 labels=None, return_feat: bool = False):
        if x.ndim == 4:                     # (N*segs, H, W, C)
            x = x.mean(axis=(1, 2))
        x = x.reshape((-1, self._segments()) + x.shape[1:])
        x = x.mean(axis=1)                  # AvgConsensus
        if self.dropout_ratio:
            x = nn.Dropout(self.dropout_ratio,
                           deterministic=not train)(x)
        feat = x                            # pre-BNNeck feat feeds reid
        self.sow('intermediates', 'reid_feat', feat)
        if self.use_bnneck:
            x = nn.BatchNorm(use_running_average=not train,
                             use_bias=False, dtype=self.dtype,
                             name='bnneck')(x)
        score = self._score(x, train, labels)
        return (score, feat) if return_feat else score


@HEADS.register_module()
class FGTSMReidSimpleHead(_ReidHeadBase):
    """Foreground variant: avg-pooled stream scores, max-pooled stream
    feeds the reid loss (reference reid_head.py:177-320)."""

    @nn.compact
    def __call__(self, x, train: bool = False, num_segs: int = None,
                 labels=None, return_feat: bool = False):
        x_avg = x.mean(axis=(1, 2)) if x.ndim == 4 else x
        x_mx = x.max(axis=(1, 2)) if x.ndim == 4 else x
        segs = self._segments()
        x_avg = x_avg.reshape((-1, segs) + x_avg.shape[1:]).mean(axis=1)
        x_mx = x_mx.reshape((-1, segs) + x_mx.shape[1:]).mean(axis=1)
        if self.dropout_ratio:
            drop = nn.Dropout(self.dropout_ratio,
                              deterministic=not train)
            x_avg, x_mx = drop(x_avg), drop(x_mx)
        self.sow('intermediates', 'reid_feat', x_mx)
        score = self._score(x_avg, train, labels)
        return (score, x_mx) if return_feat else score


@HEADS.register_module()
class TSMHead3D(BaseHead):
    """Multi-classifier TSM head: segments split across ``num_clfs``
    linear classifiers whose scores are averaged (reference
    tsm_head.py TSMHead3D)."""
    num_classes: int = 400
    in_channels: int = 2048
    loss_cls: Any = None
    num_segments: int = 8
    num_clfs: int = 1
    spatial_type: str = 'avg'
    dropout_ratio: float = 0.8
    init_std: float = 0.001
    is_shift: bool = True
    temporal_pool: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, num_segs: int = None):
        if x.ndim == 4:
            if self.spatial_type == 'avg':
                x = x.mean(axis=(1, 2))
            else:
                x = x.reshape(x.shape[0], -1)
        if self.dropout_ratio:
            x = nn.Dropout(self.dropout_ratio,
                           deterministic=not train)(x)
        x = x.reshape(-1, self.num_clfs,
                      (self.num_segments // self.num_clfs) * x.shape[-1])
        scores = [
            nn.Dense(self.num_classes,
                     kernel_init=nn.initializers.normal(self.init_std),
                     dtype=self.dtype, name=f'fc_cls_{i}')(x[:, i])
            for i in range(self.num_clfs)
        ]
        return jnp.stack(scores, axis=1).mean(axis=1)


@HEADS.register_module()
class RcMoDistHead(BaseHead):
    """Flow-reconstruction distillation head: each FPN level predicts a
    6-channel frame-pair flow image via 1x1x1 conv + sigmoid, MSE'd
    against the pooled target flow (reference distill_head.py
    RcMoDistHead; NTHWC here vs the reference's NCTHW)."""
    basename: str = ''
    loss_cls: Any = None
    num_classes: int = 2
    in_channels: int = 128
    dim_fpn: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_flow_mlvl, flow_q, **kwargs):
        n, t, h, w, c = flow_q.shape
        # pair adjacent frames into channels: out[..., c*2+p] =
        # flow[n, 2t+p, ...] (reference unflatten/transpose/flatten)
        fq = flow_q.reshape(n, t // 2, 2, h, w, c)
        fq = fq.transpose(0, 1, 3, 4, 5, 2).reshape(
            n, t // 2, h, w, 2 * c)

        def pool(v, kh, kw):
            nn_, tt, hh, ww, cc = v.shape
            v = v[:, :, :hh // kh * kh, :ww // kw * kw]
            v = v.reshape(nn_, tt, hh // kh, kh, ww // kw, kw, cc)
            return v.mean(axis=(3, 5))

        fq = pool(fq, 4, 4)
        rc_loss = 0.0
        for i, ft in enumerate(q_flow_mlvl):
            pred = nn.sigmoid(nn.Dense(
                2 * c, dtype=self.dtype, name=f'toimg_{i}')(ft))
            rc_loss = rc_loss + jnp.mean((pred - fq) ** 2)
            if i != len(q_flow_mlvl) - 1:
                fq = pool(fq, 2, 2)
        return dict(rc_loss=rc_loss)

    def loss_mx(self, rc_loss, **kwargs):
        return dict(loss_rc=rc_loss)
