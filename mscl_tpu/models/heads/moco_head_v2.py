"""MSCLWithAugMxHead — cross-modal RGB<->flow MoCo head.

Parity: reference mmaction/models/heads/moco_head_v2.py:15-106 —
  rf_logits = [q . k_flow | q . W'] / T,  fr_logits = [q_flow . k | q_flow . W] / T
with same_kn=True picking the *other* modality's decayed queue as
negatives (W' = weight_flow for rf). Loss = CE both directions, logged as
loss_cls_mx / loss_cls_mx_r (+ optional '_aug' suffix). Stateless.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ..builder import HEADS, build_loss
from .base import topk_accuracy


@HEADS.register_module()
class MSCLWithAugMxHead:

    def __init__(self, basename='', loss_cls=None, num_classes=2,
                 in_channels=128, same_kn=True, T=0.07):
        self.basename = f'_{basename}' if basename else ''
        self.same_kn = same_kn
        self.T = T
        self.loss_cls = build_loss(dict(
            loss_cls or dict(type='CrossEntropyLoss')))

    def forward_moco_mx(self, q, k, q_flow, k_flow, weight, weight_flow
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(reference moco_head_v2.py:38-53)."""
        rf_l_pos = jnp.einsum('nc,nc->n', q, k_flow)[:, None]
        fr_l_pos = jnp.einsum('nc,nc->n', q_flow, k)[:, None]
        if self.same_kn:
            rf_l_neg = jnp.einsum('nc,ck->nk', q, weight_flow)
            fr_l_neg = jnp.einsum('nc,ck->nk', q_flow, weight)
        else:
            rf_l_neg = jnp.einsum('nc,ck->nk', q, weight)
            fr_l_neg = jnp.einsum('nc,ck->nk', q_flow, weight_flow)
        rf_logits = jnp.concatenate([rf_l_pos, rf_l_neg], axis=1) / self.T
        fr_logits = jnp.concatenate([fr_l_pos, fr_l_neg], axis=1) / self.T
        ssl_label = jnp.zeros((rf_logits.shape[0],), jnp.int32)
        return rf_logits, fr_logits, ssl_label

    # keep the reference's private name as an alias (mscl.py:255 calls it)
    _forward_moco_mx = forward_moco_mx

    def _loss_mx(self, cls_score, labels, basename) -> Dict:
        losses: Dict[str, jnp.ndarray] = {}
        if cls_score.shape != labels.shape:
            losses[f'top1_acc{basename}'] = topk_accuracy(cls_score,
                                                          labels, 1)
            losses[f'top5_acc{basename}'] = topk_accuracy(cls_score,
                                                          labels, 5)
        losses[f'loss_cls{basename}'] = self.loss_cls(cls_score, labels)
        return losses

    def loss(self, rf_logits, fr_logits, ssl_label, suffix='') -> Dict:
        losses = self._loss_mx(rf_logits, ssl_label,
                               basename=self.basename + suffix)
        losses.update(self._loss_mx(fr_logits, ssl_label,
                                    basename=self.basename + '_r' + suffix))
        return losses
