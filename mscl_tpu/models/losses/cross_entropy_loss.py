"""Classification losses (pure functions over jnp arrays).

Parity: reference mmaction/models/losses/cross_entropy_loss.py —
  - CrossEntropyLoss       :10-120 (hard/soft labels, class weight)
  - CrossEntropyLoss_torch :122-138 (raw torch CE with ignore_index; used
    by every MSCL head with ignore_index=-1)
  - BCELossWithLogits, NLLLoss

Losses are flax-free callables so heads can use them inside jitted steps.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..builder import LOSSES


def log_softmax(x, axis=-1):
    return jax.nn.log_softmax(x, axis=axis)


def cross_entropy(cls_score: jnp.ndarray, label: jnp.ndarray,
                  class_weight: Optional[jnp.ndarray] = None,
                  ignore_index: int = -100,
                  reduction: str = 'mean') -> jnp.ndarray:
    """Hard-label CE with ignore_index masking (torch semantics: mean over
    non-ignored samples, weighted by class_weight; reduction='none'
    returns the per-sample losses, zeroed at ignored samples)."""
    logp = log_softmax(cls_score, axis=-1)
    label = label.astype(jnp.int32)
    valid = label != ignore_index
    safe_label = jnp.where(valid, label, 0)
    nll = -jnp.take_along_axis(logp, safe_label[..., None],
                               axis=-1).squeeze(-1)
    if reduction == 'none':
        if class_weight is not None:
            nll = nll * class_weight[safe_label]
        return nll * valid
    if class_weight is not None:
        w = class_weight[safe_label] * valid
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)
    nll = nll * valid
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def soft_cross_entropy(cls_score: jnp.ndarray, label: jnp.ndarray,
                       class_weight: Optional[jnp.ndarray] = None
                       ) -> jnp.ndarray:
    """Soft-label CE (reference cross_entropy_loss.py:43-60): mean over
    batch of -sum(p * log_softmax(score)))."""
    lsm = log_softmax(cls_score, axis=-1)
    if class_weight is not None:
        lsm = lsm * class_weight
    loss = -(label * lsm).sum(axis=-1)
    return loss.mean()


@LOSSES.register_module()
class CrossEntropyLoss:
    """MM2 CrossEntropyLoss: dispatches hard/soft by label shape."""

    def __init__(self, loss_weight=1.0, class_weight=None):
        self.loss_weight = loss_weight
        self.class_weight = None if class_weight is None else \
            jnp.asarray(class_weight)

    def __call__(self, cls_score, label, **kwargs):
        if label.ndim == cls_score.ndim and label.shape == cls_score.shape:
            loss = soft_cross_entropy(cls_score, label, self.class_weight)
        else:
            loss = cross_entropy(cls_score, label, self.class_weight)
        return self.loss_weight * loss


@LOSSES.register_module()
class CrossEntropyLossTorch:
    """Raw CE with ignore_index (reference CrossEntropyLoss_torch
    cross_entropy_loss.py:122-138)."""

    def __init__(self, ignore_index=-100, loss_weight=1.0):
        self.ignore_index = ignore_index
        self.loss_weight = loss_weight

    def __call__(self, cls_score, label, **kwargs):
        return self.loss_weight * cross_entropy(
            cls_score, label, ignore_index=self.ignore_index)


LOSSES.register_module(name='CrossEntropyLoss_torch',
                       module=CrossEntropyLossTorch)


@LOSSES.register_module()
class BCELossWithLogits:

    def __init__(self, loss_weight=1.0, class_weight=None):
        self.loss_weight = loss_weight
        self.class_weight = None if class_weight is None else \
            jnp.asarray(class_weight)

    def __call__(self, cls_score, label, **kwargs):
        per = jnp.maximum(cls_score, 0) - cls_score * label + \
            jnp.log1p(jnp.exp(-jnp.abs(cls_score)))
        if self.class_weight is not None:
            per = per * self.class_weight
        return self.loss_weight * per.mean()


@LOSSES.register_module()
class NLLLoss:

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, cls_score, label, **kwargs):
        label = label.astype(jnp.int32)
        nll = -jnp.take_along_axis(cls_score, label[..., None],
                                   axis=-1).squeeze(-1)
        return self.loss_weight * nll.mean()


@LOSSES.register_module()
class WeightedCrossEntropyLoss_torch:
    """Per-sample pool-weighted CE: loss = sum(w * ce) / (sum(w) + eps)
    (reference cross_entropy_loss.py WeightedCrossEntropyLoss_torch)."""

    def __init__(self, weight=None, size_average=None, ignore_index=-100,
                 loss_weight=1.0, eps=1e-5):
        self.ignore_index = ignore_index
        self.loss_weight = loss_weight
        self.eps = eps

    def __call__(self, cls_score, label, pool_weight, **kwargs):
        per = cross_entropy(cls_score, label,
                            ignore_index=self.ignore_index,
                            reduction='none')
        loss = (pool_weight * per).sum() / (pool_weight.sum() + self.eps)
        return self.loss_weight * loss


@LOSSES.register_module()
class TripletLoss:
    """Batch-hard triplet loss with margin over embedded features.

    The reference's reid heads (reid_head.py) default to
    ``loss_reid=dict(type='TripletLoss')`` but the reference registers
    no TripletLoss anywhere — registering the standard batch-hard
    formulation (hardest positive / hardest negative per anchor) fixes
    that gap, like the MSCLWithAugPosHeadV2 registration fix.
    """

    def __init__(self, margin=0.3, loss_weight=1.0):
        self.margin = margin
        self.loss_weight = loss_weight

    def __call__(self, feat, label, **kwargs):
        d2 = (jnp.sum(feat ** 2, 1)[:, None] +
              jnp.sum(feat ** 2, 1)[None, :] -
              2.0 * feat @ feat.T)
        dist = jnp.sqrt(jnp.clip(d2, 1e-12, None))
        same = (label[:, None] == label[None, :]).astype(feat.dtype)
        eye = jnp.eye(feat.shape[0], dtype=feat.dtype)
        pos_mask = same - eye
        neg_mask = 1.0 - same
        hardest_pos = (dist * pos_mask).max(axis=1)
        inf = jnp.full_like(dist, 1e9)
        hardest_neg = jnp.where(neg_mask > 0, dist, inf).min(axis=1)
        per = jnp.maximum(hardest_pos - hardest_neg + self.margin, 0.0)
        return self.loss_weight * per.mean()
