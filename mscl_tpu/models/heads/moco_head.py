"""MoCoHead — global InfoNCE loss head with basename-suffixed logging.

Parity: reference mmaction/models/heads/moco_head.py:9-81 — CE over the
(1+K) logits plus top-1/top-5 accuracy entries keyed 'top{k}_acc_<name>'.
Stateless (losses only), so it is a plain class rather than a flax module.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ..builder import HEADS, build_loss
from .base import topk_accuracy


@HEADS.register_module()
class MoCoHead:

    def __init__(self, basename='', loss_cls=None, num_classes=2,
                 in_channels=128):
        self.basename = f'_{basename}' if basename else ''
        self.num_classes = num_classes
        self.in_channels = in_channels
        self.loss_cls = build_loss(dict(
            loss_cls or dict(type='CrossEntropyLoss')))

    def loss(self, cls_score: jnp.ndarray, labels: jnp.ndarray,
             basename=None, **kwargs) -> Dict[str, jnp.ndarray]:
        if basename is None:
            basename = self.basename
        losses: Dict[str, jnp.ndarray] = {}
        labels = jnp.atleast_1d(labels)
        if cls_score.shape != labels.shape:
            losses[f'top1_acc{basename}'] = topk_accuracy(cls_score,
                                                          labels, 1)
            losses[f'top5_acc{basename}'] = topk_accuracy(cls_score,
                                                          labels, 5)
        losses[f'loss_cls{basename}'] = self.loss_cls(cls_score, labels)
        return losses
