"""Frame-alignment ablation heads (MoDist*/MSCL* pos-head family).

Parity (all compute: spatially pool RGB/flow features to (b, t, c),
optional 1x1 projections, L2-normalize, frame-similarity matrix, CE with
labels arange(t)):
  - MoDistPredHead / MoDistMSEPredHead / FGMoDistPredHead /
    MoDistPredDTHead / MTMoDistPredHead   reference moco_head.py:85-404
  - MoDistv2PosHead / MSCLWithAugPosHead / MSCLWithAugAPPosHead /
    MlvlMSCLWithAugPosHead / MAMSCLWithAugPosHead / MSCLWithAugSimpleHead
                                          reference moco_head_v2.py:110-536
Features are NTHWC: (b, t, h, w, c).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import HEADS, build_loss
from .base import topk_accuracy


def _l2norm(x, axis=-1):
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True).clip(1e-12)


def frame_sim_scores(x_q, x_q_flow, T):
    """(b, t, c) x (b, s, c) -> flattened (b*t, s) similarity logits and
    arange(t) labels."""
    x_q = _l2norm(x_q)
    x_q_flow = _l2norm(x_q_flow)
    sim = jnp.einsum('btc,bsc->bts', x_q, x_q_flow)
    b, t = sim.shape[0], sim.shape[1]
    return (sim.reshape(b * t, -1) / T,
            jnp.tile(jnp.arange(t, dtype=jnp.int32), (b,)))


class _AlignBase(nn.Module):
    """Shared config/loss machinery for the alignment-head family."""
    basename: str = ''
    loss_cls: Any = None
    loss_pos: Any = None
    num_classes: int = 2
    in_channels: int = 128
    mlvl_ids: Tuple[int, int] = (0, -1)
    bkb_channels: Tuple = (512, 128)
    t: int = 8
    T: float = 0.07
    aux_keys: Any = None
    dtype: Any = jnp.float32

    def _loss_pos_fn(self):
        return build_loss(dict(self.loss_pos or
                               dict(type='CrossEntropyLoss')))

    def _loss_cls_fn(self):
        return build_loss(dict(self.loss_cls or
                               dict(type='CrossEntropyLoss')))

    def _pos_losses(self, pos_scores, pos_labels):
        return {
            'loss_pos': self._loss_pos_fn()(pos_scores, pos_labels),
            'top1_acc_pos': topk_accuracy(pos_scores, pos_labels, 1),
            'top5_acc_pos': topk_accuracy(pos_scores, pos_labels, 5),
        }

    def loss(self, pos_scores, pos_labels, **kwargs):
        return self._pos_losses(pos_scores, pos_labels)

    # alias kept: the MoDist composite calls loss_mx (moco_head.py:137)
    def loss_mx(self, pos_scores, pos_labels, **kwargs):
        return self._pos_losses(pos_scores, pos_labels)

    def update_aux_info(self, info_name, info_dict, target):
        aux_keys = self.aux_keys or {}
        if info_name in aux_keys:
            for k in aux_keys[info_name]:
                new_key = aux_keys[info_name][k]
                assert new_key not in target
                target[new_key] = info_dict[k]
        return target

    def _trans_rgb(self, x, style):
        if self.bkb_channels[0] is None:
            return x
        if style == 'mlp2':
            x = nn.Dense(128, dtype=self.dtype, name='trans_rgb_0')(x)
            x = nn.relu(x)
            return nn.Dense(128, dtype=self.dtype, name='trans_rgb_1')(x)
        return nn.Dense(128, dtype=self.dtype, name='trans_rgb')(x)

    def _trans_flow(self, x, style='conv1'):
        if style == 'identity' or self.bkb_channels[1] is None:
            return x
        if style == 'detach':
            return jax.lax.stop_gradient(x)
        return nn.Dense(128, dtype=self.dtype, name='trans_flow')(x)


@HEADS.register_module()
class MoDistPredHead(_AlignBase):
    """reference moco_head.py:85-188 (single flow level, conv1 trans)."""
    rgb_trans_style: str = 'conv1'
    flow_trans_style: str = 'conv1'
    flow_source: str = 'single'  # q_flow_mlvl[-1]

    @nn.compact
    def __call__(self, q_mlvl, q_flow_mlvl, q_aug_flow_mlvl=None,
                 **kwargs):
        x_q = q_mlvl[self.mlvl_ids[0]].mean(axis=(2, 3))  # (b, t, c)
        if self.flow_source == 'concat' and q_aug_flow_mlvl is not None:
            x_f = jnp.concatenate(
                [q_flow_mlvl[self.mlvl_ids[1]],
                 q_aug_flow_mlvl[self.mlvl_ids[1]]], axis=1)
        elif self.flow_source == 'first':
            x_f = q_flow_mlvl[0]
        else:
            x_f = q_flow_mlvl[self.mlvl_ids[1]]
        x_f = x_f.mean(axis=(2, 3))
        x_q = self._trans_rgb(x_q, self.rgb_trans_style)
        x_f = self._trans_flow(x_f, self.flow_trans_style)
        pos_scores, pos_labels = frame_sim_scores(x_q, x_f, self.T)
        return dict(pos_scores=pos_scores, pos_labels=pos_labels)


@HEADS.register_module()
class MoDistMSEPredHead(MoDistPredHead):
    """+ MSE between the projected normalized features
    (reference moco_head.py:191-231)."""
    pred_weights: Tuple[float, float] = (1.0, 1.0)

    @nn.compact
    def __call__(self, q_mlvl, q_flow_mlvl, q_aug_flow_mlvl=None,
                 **kwargs):
        x_q = q_mlvl[self.mlvl_ids[0]].mean(axis=(2, 3))
        x_f = q_flow_mlvl[self.mlvl_ids[1]].mean(axis=(2, 3))
        x_q = _l2norm(self._trans_rgb(x_q, self.rgb_trans_style))
        x_f = _l2norm(self._trans_flow(x_f, self.flow_trans_style))
        sim = jnp.einsum('btc,bsc->bts', x_q, x_f)
        b, t = sim.shape[0], sim.shape[1]
        return dict(pos_scores=sim.reshape(b * t, -1) / self.T,
                    pos_labels=jnp.tile(jnp.arange(t, dtype=jnp.int32),
                                        (b,)),
                    pred_rgb=x_q, pred_flow=x_f)

    def loss_mx(self, pos_scores, pos_labels, pred_rgb=None,
                pred_flow=None, **kwargs):
        losses = self._pos_losses(pos_scores, pos_labels)
        losses['loss_pos'] = losses['loss_pos'] * self.pred_weights[0]
        if pred_rgb is not None:
            losses['loss_pred'] = self.pred_weights[1] * jnp.mean(
                (pred_rgb - pred_flow) ** 2)
        return losses

    loss = loss_mx


@HEADS.register_module()
class FGMoDistPredHead(_AlignBase):
    """Fine-grained (per-spatial-position) alignment
    (reference moco_head.py:234-266): RGB avg-pooled 4x4, flow kept,
    alignment per (h, w) location."""

    @nn.compact
    def __call__(self, q_mlvl, q_flow_mlvl, **kwargs):
        x_q = q_mlvl[self.mlvl_ids[0]]      # (b, t, H, W, c)
        x_f = q_flow_mlvl[self.mlvl_ids[1]]
        b, t, h, w, c = x_q.shape
        # 4x4 spatial avg-pool of RGB (28 -> 7)
        x_q = x_q.reshape(b, t, h // 4, 4, w // 4, 4, c).mean((3, 5))
        x_f = self._trans_flow(x_f, 'conv1')
        x_q = _l2norm(x_q)
        x_f = _l2norm(x_f)
        # (b, h, w, t, c) x (b, h, w, s, c)
        x_q = jnp.moveaxis(x_q, 1, 3)
        x_f = jnp.moveaxis(x_f, 1, 3)
        sim = jnp.einsum('bhwtc,bhwsc->bhwts', x_q, x_f)
        bt = b * sim.shape[1] * sim.shape[2] * t
        pos_scores = sim.reshape(bt, -1) / self.T
        pos_labels = jnp.tile(jnp.arange(t, dtype=jnp.int32),
                              (bt // t,))
        return dict(pos_scores=pos_scores, pos_labels=pos_labels)


@HEADS.register_module()
class MoDistPredDTHead(MoDistPredHead):
    """Flow features detached (reference moco_head.py:269-376)."""
    flow_trans_style: str = 'detach'


@HEADS.register_module()
class MTMoDistPredHead(MoDistPredHead):
    """Aligns against the first flow level (reference
    moco_head.py:379-404)."""
    flow_source: str = 'first'


@HEADS.register_module()
class MoDistv2PosHead(MoDistPredHead):
    """MLP rgb projection variant (reference moco_head_v2.py:128-196)."""
    rgb_trans_style: str = 'mlp2'


@HEADS.register_module()
class MSCLWithAugPosHead(MoDistPredHead):
    """Concat base+rotated flow as LMCL targets with MLP rgb projection
    (reference moco_head_v2.py:198-266)."""
    rgb_trans_style: str = 'mlp2'
    flow_source: str = 'concat'


@HEADS.register_module()
class MSCLWithAugSimpleHead(_AlignBase):
    """No-op head (reference moco_head_v2.py:110-126)."""

    @nn.compact
    def __call__(self, **kwargs):
        return dict()

    def loss(self, **kwargs):
        return dict()

    def update_aux_info(self, info_name, info_dict, target):
        return target


@HEADS.register_module()
class MSCLWithAugAPPosHead(_AlignBase):
    """LMCL + FRA rotation-angle prediction head (reference
    moco_head_v2.py:269-349): expects the neck to append the global
    embedding as the last mlvl entry (MixBaseMoCo)."""
    num_ap: int = 8

    @nn.compact
    def __call__(self, q_mlvl, q_flow_mlvl, q_aug_flow_mlvl, **kwargs):
        assert self.bkb_channels[0] is None, \
            'AP head requires FPN-projected RGB features'
        q_ap, q_mlvl = q_mlvl[-1], q_mlvl[:-1]
        q_aug_flow_ap = q_aug_flow_mlvl[-1]
        q_flow_mlvl = q_flow_mlvl[:-1]
        q_aug_flow_mlvl = q_aug_flow_mlvl[:-1]
        ap_in = jnp.concatenate([q_ap, q_aug_flow_ap], axis=-1)
        ap = nn.Dense(128, dtype=self.dtype, name='ap_fc1')(ap_in)
        ap = nn.relu(ap)
        ap_scores = nn.Dense(self.num_ap, dtype=self.dtype,
                             name='ap_fc2')(ap)

        x_q = q_mlvl[self.mlvl_ids[0]].mean(axis=(2, 3))
        x_f = jnp.concatenate(
            [q_flow_mlvl[self.mlvl_ids[1]],
             q_aug_flow_mlvl[self.mlvl_ids[1]]], axis=1).mean(axis=(2, 3))
        x_f = self._trans_flow(x_f, 'conv1')
        pos_scores, pos_labels = frame_sim_scores(x_q, x_f, self.T)
        return dict(pos_scores=pos_scores, pos_labels=pos_labels,
                    ap_scores=ap_scores)

    def loss(self, pos_scores, pos_labels, ap_scores=None, ap_labels=None,
             **kwargs):
        losses = self._pos_losses(pos_scores, pos_labels)
        if ap_scores is not None and ap_labels is not None:
            losses['loss_ap'] = self._loss_cls_fn()(
                ap_scores, jnp.asarray(ap_labels).reshape(-1))
        return losses


@HEADS.register_module()
class MlvlMSCLWithAugPosHead(_AlignBase):
    """Multi-level LMCL: alignment at several pyramid levels, losses
    suffixed per level and divided by the level count
    (reference moco_head_v2.py:352-441)."""
    mlvl_ids: Sequence[int] = (0, 1, 2)
    mlvl_flow_ids: Sequence[int] = (-1, -1, -1)
    pool_type: str = 'avg'

    def _pool(self, x):
        return x.max(axis=(2, 3)) if self.pool_type == 'max' else \
            x.mean(axis=(2, 3))

    @nn.compact
    def __call__(self, q_mlvl, q_flow_mlvl, q_aug_flow_mlvl=None,
                 **kwargs):
        pos_scores, pos_labels = [], []
        for rgb_id, flow_id in zip(self.mlvl_ids, self.mlvl_flow_ids):
            x_q = self._pool(q_mlvl[rgb_id])
            if q_aug_flow_mlvl is not None:
                x_f = self._pool(jnp.concatenate(
                    [q_flow_mlvl[flow_id], q_aug_flow_mlvl[flow_id]],
                    axis=1))
            else:
                x_f = self._pool(q_flow_mlvl[flow_id])
            x_q = self._trans_rgb(x_q, 'conv1')
            x_f = self._trans_flow(x_f, 'conv1')
            s, l = frame_sim_scores(x_q, x_f, self.T)
            pos_scores.append(s)
            pos_labels.append(l)
        return dict(pos_scores=pos_scores, pos_labels=pos_labels)

    def loss(self, pos_scores, pos_labels, **kwargs):
        losses = {}
        n = len(self.mlvl_ids)
        for i, (s, l) in enumerate(zip(pos_scores, pos_labels)):
            part = self._pos_losses(s, l)
            part['loss_pos'] = part['loss_pos'] / n
            losses.update({f'{k}_{i}': v for k, v in part.items()})
        return losses


@HEADS.register_module()
class MAMSCLWithAugPosHead(_AlignBase):
    """Motion-map-weighted spatial LMCL (reference
    moco_head_v2.py:444-536): only the top chosen_rate fraction of
    positions (by motion magnitude) contribute; labels elsewhere are
    ignore_index -1."""
    chosen_rate: float = 0.2

    @nn.compact
    def __call__(self, q_mlvl, q_flow_mlvl, motion_maps=None, **kwargs):
        x_q = q_mlvl[self.mlvl_ids[0]]      # (b, t, H, W, c)
        x_f = q_flow_mlvl[self.mlvl_ids[1]]
        b, t, h, w, c = x_q.shape
        x_q = x_q.reshape(b, t, h // 4, 4, w // 4, 4, c).mean((3, 5))
        x_f = self._trans_flow(x_f, 'conv1')
        x_q = _l2norm(x_q)
        x_f = _l2norm(x_f)
        hq, wq = x_q.shape[2], x_q.shape[3]
        x_qm = jnp.moveaxis(x_q, 1, 3)
        x_fm = jnp.moveaxis(x_f, 1, 3)
        sim = jnp.einsum('bhwtc,bhwsc->bhwts', x_qm, x_fm)
        labels = jnp.tile(jnp.arange(t, dtype=jnp.int32),
                          (b * hq * wq,)).reshape(b, hq, wq, t)
        if motion_maps is not None:
            # keep top chosen_rate positions per (b, t)
            mm = motion_maps
            if mm.ndim == 5:
                mm = mm[..., 0]
            # downsample map to (hq, wq) by average pooling
            mh, mw = mm.shape[2], mm.shape[3]
            mm = mm.reshape(b, t, hq, mh // hq, wq, mw // wq).mean((3, 5))
            k = max(int(hq * wq * self.chosen_rate), 1)
            flat = mm.reshape(b, t, -1)
            thresh = jnp.sort(flat, axis=-1)[..., -k][..., None]
            keep = (flat >= thresh).reshape(b, t, hq, wq)
            keep = jnp.moveaxis(keep, 1, 3)  # (b, hq, wq, t)
            labels = jnp.where(keep, labels, -1)
        pos_scores = sim.reshape(b * hq * wq * t, -1) / self.T
        pos_labels = labels.reshape(-1)
        return dict(pos_scores=pos_scores, pos_labels=pos_labels)
