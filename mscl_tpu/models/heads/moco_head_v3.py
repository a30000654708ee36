"""Feature-level MoCo heads and Mean-Shift (MSF) ablation heads.

Parity: reference mmaction/models/heads/moco_head_v3.py:16-389 —
  - MoCoHeadV2: InfoNCE from precomputed (q, k, weight)
  - MSFHead: mean-shift loss — mean distance of q to k's top-k nearest
    queue entries; logs label purity
  - NMSFHead: MSF with negatives via MultiPositive* losses
  - MSCLWithAugMSFMxHead: cross-modal MSF distill
  - MSCLWithAugDistillMxHead: cross-modal InfoNCE + KL distribution
    distillation over queue similarities

(Note the reference file has a broken import — `from mmaction2.mmaction...`
moco_head_v3.py:8 — that only resolves when the repo directory is named
'mmaction2'; fixed by construction here.)

All stateless, computed over jnp arrays inside the jitted step.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..builder import HEADS, build_loss
from .base import topk_accuracy


@HEADS.register_module()
class MoCoHeadV2:
    """reference moco_head_v3.py:16-85."""

    def __init__(self, basename='', loss_cls=None, num_classes=2,
                 in_channels=128, T=0.07):
        self.basename = f'_{basename}' if basename else ''
        self.T = T
        self.loss_cls = build_loss(dict(
            loss_cls or dict(type='CrossEntropyLoss')))

    def __call__(self, q, k, weight, **kwargs):
        l_pos = jnp.einsum('nc,nc->n', q, k)[:, None]
        l_neg = jnp.einsum('nc,ck->nk', q, weight)
        logits = jnp.concatenate([l_pos, l_neg], axis=1) / self.T
        ssl_label = jnp.zeros((logits.shape[0],), jnp.int32)
        return dict(cls_score=logits, ssl_label=ssl_label)

    forward = __call__

    def loss(self, cls_score, ssl_label, basename=None, **kwargs) -> Dict:
        if basename is None:
            basename = self.basename
        losses = {
            f'top1_acc{basename}': topk_accuracy(cls_score, ssl_label, 1),
            f'top5_acc{basename}': topk_accuracy(cls_score, ssl_label, 5),
            f'loss_cls{basename}': self.loss_cls(cls_score, ssl_label),
        }
        return losses

    def loss_mx(self, **kwargs):
        return dict()


@HEADS.register_module()
class MSFHead:
    """Mean-Shift head (reference moco_head_v3.py:88-149): pull q towards
    the top-k nearest queue entries of its key."""

    def __init__(self, basename='', loss_cls=None, num_classes=2,
                 in_channels=128, topk=5):
        self.basename = f'_{basename}' if basename else ''
        self.topk = topk

    def __call__(self, q, k, weight, label, label_queue, **kwargs):
        dist_t = 2 - 2 * jnp.einsum('bc,ck->bk', k, weight)
        dist_q = 2 - 2 * jnp.einsum('bc,ck->bk', q, weight)
        _, nn_index = jax.lax.top_k(-dist_t, self.topk)  # smallest dist
        nn_dist_q = jnp.take_along_axis(dist_q, nn_index, axis=1)
        lq = jnp.take_along_axis(
            jnp.broadcast_to(label_queue[None],
                             (q.shape[0], label_queue.shape[0])),
            nn_index, axis=1)
        matches = (lq == label[:, None]).astype(jnp.float32)
        return dict(nn_dist_q=nn_dist_q, matches=matches)

    forward = __call__

    def loss(self, nn_dist_q, matches, basename=None, **kwargs) -> Dict:
        if basename is None:
            basename = self.basename
        return {
            f'loss_msf{basename}': (nn_dist_q.sum(axis=1) /
                                    self.topk).mean(),
            f'msf_purity{basename}': jax.lax.stop_gradient(
                (matches.sum(axis=1) / self.topk).mean()),
        }

    def loss_mx(self, **kwargs):
        return dict()


def _msf_sp_sn(q, k, weight, topk, T):
    """Top-k positives by key-similarity; everything else negatives
    (reference moco_head_v3.py:173-191 / 243-255)."""
    dist_t = jnp.einsum('bc,ck->bk', k, weight)
    dist_q = jnp.einsum('bc,ck->bk', q, weight) / T
    _, nn_index = jax.lax.top_k(dist_t, topk)
    sp = jnp.take_along_axis(dist_q, nn_index, axis=1)
    mask = jnp.zeros_like(dist_q).at[
        jnp.arange(dist_q.shape[0])[:, None], nn_index].set(1.0)
    sn = dist_q * (1 - mask) + (-1e6) * mask
    return sp, sn


@HEADS.register_module()
class NMSFHead:
    """MSF with negatives (reference moco_head_v3.py:152-218)."""

    def __init__(self, basename='', loss_cls=None, num_classes=2,
                 in_channels=128, T=0.07, topk=5, pos_type='sum'):
        self.basename = f'_{basename}' if basename else ''
        self.T = T
        self.topk = topk
        self.loss_cls = build_loss(dict(
            loss_cls or dict(type='MultiPositiveSumLoss')))

    def __call__(self, q, k, weight, label, label_queue, **kwargs):
        sp, sn = _msf_sp_sn(q, k, weight, self.topk, self.T)
        dist_t = jnp.einsum('bc,ck->bk', k, weight)
        _, nn_index = jax.lax.top_k(dist_t, self.topk)
        lq = jnp.take_along_axis(
            jnp.broadcast_to(label_queue[None],
                             (q.shape[0], label_queue.shape[0])),
            nn_index, axis=1)
        matches = (lq == label[:, None]).astype(jnp.float32)
        return dict(sp=sp, sn=sn, matches=matches)

    forward = __call__

    def loss(self, sp, sn, matches, basename=None, **kwargs) -> Dict:
        if basename is None:
            basename = self.basename
        return {
            f'loss_circle{basename}': self.loss_cls(sp, sn),
            f'msf_purity{basename}': jax.lax.stop_gradient(
                (matches.sum(axis=1) / self.topk).mean()),
        }

    def loss_mx(self, **kwargs):
        return dict()


@HEADS.register_module()
class MSCLWithAugMSFMxHead:
    """Cross-modal MSF distill (reference moco_head_v3.py:221-293)."""

    def __init__(self, basename='', loss_cls=None, num_classes=2,
                 in_channels=128, same_kn=True, T=0.07, topk=5,
                 pos_type='sum'):
        self.basename = f'_{basename}' if basename else ''
        self.same_kn = same_kn
        self.T = T
        self.topk = topk
        self.loss_cls = build_loss(dict(
            loss_cls or dict(type='MultiPositiveSumLoss')))

    def forward_moco_mx(self, q, k, q_flow, k_flow, weight, weight_flow,
                        **kwargs):
        if self.same_kn:
            rf = _msf_sp_sn(q, k_flow, weight_flow, self.topk, self.T)
            fr = _msf_sp_sn(q_flow, k, weight, self.topk, self.T)
        else:
            rf = _msf_sp_sn(q, k_flow, weight, self.topk, self.T)
            fr = _msf_sp_sn(q_flow, k, weight_flow, self.topk, self.T)
        ssl_label = jnp.zeros((rf[0].shape[0],), jnp.int32)
        return rf, fr, ssl_label

    _forward_moco_mx = forward_moco_mx

    def _loss_mx(self, logits, labels, basename=None) -> Dict:
        if basename is None:
            basename = self.basename
        return {f'loss_circle{basename}': self.loss_cls(*logits)}

    def loss(self, rf_logits, fr_logits, ssl_label, suffix='') -> Dict:
        losses = self._loss_mx(rf_logits, ssl_label,
                               basename=self.basename + suffix)
        losses.update(self._loss_mx(
            fr_logits, ssl_label,
            basename=self.basename + '_r' + suffix))
        return losses


@HEADS.register_module()
class MSCLWithAugDistillMxHead:
    """Cross-modal InfoNCE + queue-similarity KL distillation
    (reference moco_head_v3.py:297-389)."""

    def __init__(self, basename='', loss_cls=None, num_classes=2,
                 in_channels=128, same_kn=True, T=0.07,
                 small_p: Optional[int] = None):
        self.basename = f'_{basename}' if basename else ''
        self.same_kn = same_kn
        self.T = T
        self.small_p = small_p
        self.loss_cls = build_loss(dict(
            loss_cls or dict(type='CrossEntropyLoss')))

    def forward_moco_mx(self, q, k, q_flow, k_flow, weight, weight_flow):
        rf_l_pos = jnp.einsum('nc,nc->n', q, k_flow)[:, None]
        fr_l_pos = jnp.einsum('nc,nc->n', q_flow, k)[:, None]
        if self.same_kn:
            rf_l_neg = jnp.einsum('nc,ck->nk', q, weight_flow)
            fr_l_neg = jnp.einsum('nc,ck->nk', q_flow, weight)
        else:
            rf_l_neg = jnp.einsum('nc,ck->nk', q, weight)
            fr_l_neg = jnp.einsum('nc,ck->nk', q_flow, weight_flow)
        rf_logits = jnp.concatenate([rf_l_pos, rf_l_neg], 1) / self.T
        fr_logits = jnp.concatenate([fr_l_pos, fr_l_neg], 1) / self.T

        p_rgb = jnp.einsum('nc,ck->nk', q, weight)
        p_flow = jnp.einsum('nc,ck->nk', q_flow, weight_flow)
        if self.small_p is not None:
            dist_t = 2 - 2 * p_flow
            _, nn_index = jax.lax.top_k(-dist_t, self.small_p)
            p_rgb = jnp.take_along_axis(p_rgb, nn_index, axis=1)
            p_flow = jnp.take_along_axis(p_flow, nn_index, axis=1)
        p_rgb = jax.nn.softmax(p_rgb, axis=-1)
        p_flow = jax.nn.softmax(p_flow, axis=-1)
        ssl_label = jnp.zeros((rf_logits.shape[0],), jnp.int32)
        # KLDivLoss(batchmean)(log p_rgb, p_flow)
        loss_kl = (p_flow * (jnp.log(p_flow.clip(1e-12)) -
                             jnp.log(p_rgb.clip(1e-12)))).sum() / \
            p_rgb.shape[0]
        return rf_logits, fr_logits, ssl_label, dict(loss_kl=loss_kl)

    _forward_moco_mx = forward_moco_mx

    def _loss_mx(self, cls_score, labels, basename=None) -> Dict:
        if basename is None:
            basename = self.basename
        return {
            f'top1_acc{basename}': topk_accuracy(cls_score, labels, 1),
            f'top5_acc{basename}': topk_accuracy(cls_score, labels, 5),
            f'loss_cls{basename}': self.loss_cls(cls_score, labels),
        }

    def loss(self, rf_logits, fr_logits, ssl_label, loss_kl, suffix='',
             **kwargs) -> Dict:
        losses = self._loss_mx(rf_logits, ssl_label,
                               basename=self.basename + suffix)
        losses.update(self._loss_mx(
            fr_logits, ssl_label,
            basename=self.basename + '_r' + suffix))
        losses['loss_kl'] = loss_kl
        return losses
