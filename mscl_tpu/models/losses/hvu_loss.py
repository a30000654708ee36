"""HVULoss and OHEM hinge loss.

Parity: reference mmaction/models/losses/hvu_loss.py (multi-task BCE over
tag-category slices with optional category masks) and
ohem_hinge_loss.py (class-wise hinge with online hard example mining —
the straight-through top-k formulation replaces the handwritten autograd
Function: selecting the top-k losses is itself differentiable a.e.).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..builder import LOSSES


def _bce_with_logits(score, label):
    return jnp.maximum(score, 0) - score * label + \
        jnp.log1p(jnp.exp(-jnp.abs(score)))


@LOSSES.register_module()
class HVULoss:

    def __init__(self,
                 categories=('action', 'attribute', 'concept', 'event',
                             'object', 'scene'),
                 category_nums=(739, 117, 291, 69, 1678, 248),
                 category_loss_weights=(1, 1, 1, 1, 1, 1),
                 loss_type='all', with_mask=False, reduction='mean',
                 loss_weight=1.0):
        assert loss_type in ('individual', 'all')
        assert reduction in ('mean', 'sum')
        assert len(category_nums) == len(category_loss_weights)
        self.categories = categories
        self.category_nums = category_nums
        self.category_loss_weights = category_loss_weights
        self.loss_type = loss_type
        self.with_mask = with_mask
        self.reduction = reduction
        self.category_startidx = [0]
        for n in category_nums[:-1]:
            self.category_startidx.append(self.category_startidx[-1] + n)

    def __call__(self, cls_score, label, mask=None, category_mask=None,
                 **kwargs):
        if self.loss_type == 'all':
            per = _bce_with_logits(cls_score, label)
            if self.with_mask and mask is not None:
                per = per * mask
                denom = jnp.maximum(mask.sum(axis=1), 1.0)
                loss = (per.sum(axis=1) / denom).mean()
            else:
                loss = per.mean()
            return dict(loss_cls=loss)

        losses = {}
        total, wsum = 0.0, 0.0
        for name, num, start, w in zip(self.categories,
                                       self.category_nums,
                                       self.category_startidx,
                                       self.category_loss_weights):
            score_c = cls_score[:, start:start + num]
            label_c = label[:, start:start + num]
            per = _bce_with_logits(score_c, label_c)
            if self.reduction == 'mean':
                cat_loss = per.mean(axis=1)
            else:
                cat_loss = per.sum(axis=1)
            if self.with_mask and category_mask is not None:
                idx = list(self.categories).index(name)
                cmask = category_mask[:, idx]
                cat_loss = (cat_loss * cmask).sum() / \
                    jnp.maximum(cmask.sum(), 1.0)
            else:
                cat_loss = cat_loss.mean()
            losses[f'{name}_LOSS'] = cat_loss
            total = total + cat_loss * w
            wsum += w
        losses['loss_cls'] = total / max(wsum, 1e-12)
        return losses


def ohem_hinge_loss(pred, labels, is_positive, ohem_ratio, group_size):
    """Class-wise hinge loss with OHEM (reference ohem_hinge_loss.py):
    keep the top ohem_ratio fraction of losses per proposal group.
    labels are 1-indexed."""
    idx = jnp.arange(pred.shape[0])
    scores = pred[idx, labels - 1]
    losses = jnp.maximum(0.0, 1.0 - is_positive * scores)
    losses = losses.reshape(-1, group_size)
    keep = max(int(group_size * ohem_ratio), 1)
    top, _ = jax.lax.top_k(losses, keep)
    return top.sum()


@LOSSES.register_module()
class OHEMHingeLoss:

    def __init__(self, ohem_ratio=0.17, group_size=8, is_positive=1):
        self.ohem_ratio = ohem_ratio
        self.group_size = group_size
        self.is_positive = is_positive

    def __call__(self, pred, labels, is_positive=None, ohem_ratio=None,
                 group_size=None, **kwargs):
        return ohem_hinge_loss(
            pred, labels,
            self.is_positive if is_positive is None else is_positive,
            self.ohem_ratio if ohem_ratio is None else ohem_ratio,
            self.group_size if group_size is None else group_size)
