"""BaseHead — classification head protocol + jit-friendly accuracy.

Parity: reference mmaction/models/heads/base.py (loss() returns a dict of
'loss_cls' + 'top1_acc'/'top5_acc'; label smoothing / multi-class soft
targets supported).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import build_loss


def topk_accuracy(cls_score: jnp.ndarray, labels: jnp.ndarray, k: int
                  ) -> jnp.ndarray:
    """Sort-free top-k accuracy usable inside jit.

    rank(label) = #logits strictly greater than the label's logit;
    top-k hit iff rank < k. O(n) elementwise instead of lax.top_k's
    full sort — with MoCo's (B, 65537) logits the six per-step top_k
    sorts cost 17 ms/step on v5e (profile_step.py trace); this is the
    branchless replacement. Ties resolve optimistically (a tie with
    the label's logit counts as a hit), which only differs from
    lax.top_k when logits are exactly equal."""
    labels = labels.reshape(-1).astype(jnp.int32)
    k = min(k, cls_score.shape[-1])
    label_logit = jnp.take_along_axis(
        cls_score, labels[:, None], axis=-1)
    rank = (cls_score > label_logit).sum(axis=-1)
    hit = rank < k
    return jax.lax.stop_gradient(hit.mean().astype(jnp.float32))


class BaseHead(nn.Module):
    """Subclasses define __call__ producing cls_score; loss() is shared."""
    num_classes: int = 400
    loss_cls: Any = None
    multi_class: bool = False
    label_smooth_eps: float = 0.0
    topk: tuple = (1, 5)

    def _build_loss(self):
        cfg = self.loss_cls or dict(type='CrossEntropyLoss')
        return build_loss(dict(cfg))

    def loss(self, cls_score, labels, **kwargs):
        losses = {}
        labels = labels.reshape(-1) if labels.ndim > 1 and \
            labels.shape[-1] == 1 else labels
        if not self.multi_class and labels.ndim == 1:
            for k in self.topk:
                if k <= cls_score.shape[-1]:
                    losses[f'top{k}_acc'] = topk_accuracy(
                        cls_score, labels, k)
        if self.multi_class and self.label_smooth_eps != 0:
            labels = ((1 - self.label_smooth_eps) * labels +
                      self.label_smooth_eps / self.num_classes)
        loss_fn = self._build_loss()
        losses['loss_cls'] = loss_fn(cls_score, labels, **kwargs)
        return losses
