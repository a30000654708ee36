"""BSN — Boundary Sensitive Network (TEM + PEM).

Parity: reference mmaction/models/localizers/bsn.py —
  - TEM (:14-226): 3 conv1d stack producing sigmoid action/start/end
    curves, class-balanced logistic losses, IoP label generation
  - PEM (:229-400): 2-layer MLP scoring BSP proposal features with a
    balanced smooth-L1 IoU regression

Channel-last (B, T, C) features; proposal generation/post-processing on
host (localization/proposal_utils.py).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import RECOGNIZERS, build_loss
from ...localization.proposal_utils import post_processing, temporal_iop
from .base import parse_losses_localizer


@RECOGNIZERS.register_module()
class TEM(nn.Module):
    temporal_dim: int = 100
    boundary_ratio: float = 0.1
    tem_feat_dim: int = 400
    tem_hidden_dim: int = 512
    tem_match_threshold: float = 0.5
    loss_cls: Any = None
    loss_weight: float = 2.0
    output_dim: int = 3
    conv1_ratio: float = 1.0
    conv2_ratio: float = 1.0
    conv3_ratio: float = 0.01
    train_cfg: Any = None
    test_cfg: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        self._loss = build_loss(dict(
            self.loss_cls or dict(type='BinaryLogisticRegressionLoss')))

    def _anchors(self):
        tgap = 1.0 / self.temporal_dim
        tmins = np.arange(self.temporal_dim) * tgap
        return tmins, tmins + tgap

    @nn.compact
    def _forward(self, x, train: bool = False):
        # x: (B, T, C)
        x = nn.relu(self.conv1_ratio * nn.Conv(
            self.tem_hidden_dim, (3,), padding=[(1, 1)],
            dtype=self.dtype, name='conv1')(x))
        x = nn.relu(self.conv2_ratio * nn.Conv(
            self.tem_hidden_dim, (3,), padding=[(1, 1)],
            dtype=self.dtype, name='conv2')(x))
        x = nn.sigmoid(self.conv3_ratio * nn.Conv(
            self.output_dim, (1,), dtype=self.dtype, name='conv3')(x))
        return x  # (B, T, 3)

    def forward_train(self, raw_feature, label_action, label_start,
                      label_end, train: bool = True) -> Dict:
        out = self._forward(raw_feature, train)
        loss_action = self._loss(out[..., 0], label_action,
                                 self.tem_match_threshold)
        loss_start = self._loss(out[..., 1], label_start,
                                self.tem_match_threshold)
        loss_end = self._loss(out[..., 2], label_end,
                              self.tem_match_threshold)
        total = loss_action * self.loss_weight + loss_start + loss_end
        return dict(loss=total,
                    loss_action=loss_action * self.loss_weight,
                    loss_start=loss_start, loss_end=loss_end)

    def forward_test(self, raw_feature):
        return self._forward(raw_feature, train=False)

    def __call__(self, raw_feature, train: bool = False,
                 return_loss: bool = False, **labels):
        if return_loss:
            return self.forward_train(raw_feature, train=train, **labels)
        return self.forward_test(raw_feature)

    def train_step(self, batch, train: bool = True):
        losses = self.forward_train(
            batch['raw_feature'], batch['label_action'],
            batch['label_start'], batch['label_end'], train=train)
        return parse_losses_localizer(losses)

    def generate_labels(self, gt_bbox):
        """Host label generation (reference bsn.py:163-207)."""
        a_list, s_list, e_list = [], [], []
        for every_gt_bbox in gt_bbox:
            every_gt_bbox = np.asarray(every_gt_bbox, np.float32)
            gt_tmins = every_gt_bbox[:, 0]
            gt_tmaxs = every_gt_bbox[:, 1]
            gt_lens = gt_tmaxs - gt_tmins
            pad = np.maximum(1.0 / self.temporal_dim,
                             self.boundary_ratio * gt_lens)
            starts = np.stack([gt_tmins - pad / 2, gt_tmins + pad / 2], 1)
            ends = np.stack([gt_tmaxs - pad / 2, gt_tmaxs + pad / 2], 1)
            ma, ms, me = [], [], []
            anchors_tmins, anchors_tmaxs = self._anchors()
            for tmin, tmax in zip(anchors_tmins, anchors_tmaxs):
                ma.append(np.max(temporal_iop(tmin, tmax, gt_tmins,
                                              gt_tmaxs)))
                ms.append(np.max(temporal_iop(tmin, tmax, starts[:, 0],
                                              starts[:, 1])))
                me.append(np.max(temporal_iop(tmin, tmax, ends[:, 0],
                                              ends[:, 1])))
            a_list.append(ma)
            s_list.append(ms)
            e_list.append(me)
        return (np.array(a_list, np.float32),
                np.array(s_list, np.float32),
                np.array(e_list, np.float32))


@RECOGNIZERS.register_module()
class PEM(nn.Module):
    pem_feat_dim: int = 32
    pem_hidden_dim: int = 256
    pem_u_ratio_m: float = 1.0
    pem_u_ratio_l: float = 2.0
    pem_high_temporal_iou_threshold: float = 0.6
    pem_low_temporal_iou_threshold: float = 0.2
    soft_nms_alpha: float = 0.75
    soft_nms_low_threshold: float = 0.65
    soft_nms_high_threshold: float = 0.9
    post_process_top_k: int = 100
    feature_extraction_interval: int = 16
    fc1_ratio: float = 0.1
    fc2_ratio: float = 0.1
    output_dim: int = 1
    train_cfg: Any = None
    test_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def _forward(self, x):
        x = nn.relu(self.fc1_ratio * nn.Dense(
            self.pem_hidden_dim, dtype=self.dtype, name='fc1')(x))
        x = nn.sigmoid(self.fc2_ratio * nn.Dense(
            self.output_dim, dtype=self.dtype, name='fc2')(x))
        return x

    def forward_train(self, bsp_feature, reference_temporal_iou,
                      train: bool = True) -> Dict:
        pred = self._forward(bsp_feature).reshape(-1)
        ref = reference_temporal_iou.reshape(-1)
        u_hmask = (ref > self.pem_high_temporal_iou_threshold).astype(
            jnp.float32)
        u_mmask = ((ref <= self.pem_high_temporal_iou_threshold) &
                   (ref > self.pem_low_temporal_iou_threshold)).astype(
                       jnp.float32)
        u_lmask = (ref <= self.pem_low_temporal_iou_threshold).astype(
            jnp.float32)
        num_h = u_hmask.sum()
        num_m = jnp.maximum(u_mmask.sum(), 1.0)
        num_l = jnp.maximum(u_lmask.sum(), 1.0)
        k1, k2 = jax.random.split(self.make_rng('moco'))
        r_m = jnp.minimum(self.pem_u_ratio_m * num_h / num_m, 1.0)
        u_smmask = (jax.random.uniform(k1, ref.shape) * u_mmask >
                    (1.0 - r_m)).astype(jnp.float32)
        r_l = jnp.minimum(self.pem_u_ratio_l * num_h / num_l, 1.0)
        u_slmask = (jax.random.uniform(k2, ref.shape) * u_lmask >
                    (1.0 - r_l)).astype(jnp.float32)
        weights = u_hmask + u_smmask + u_slmask
        diff = pred - ref
        huber = jnp.where(jnp.abs(diff) < 1, 0.5 * diff ** 2,
                          jnp.abs(diff) - 0.5)
        loss = (huber * weights).sum() / jnp.maximum(weights.sum(), 1.0)
        return dict(loss=loss, temporal_iou_loss=loss)

    def forward_test(self, bsp_feature):
        return self._forward(bsp_feature).reshape(-1)

    def __call__(self, bsp_feature, reference_temporal_iou=None,
                 train: bool = False, return_loss: bool = False):
        if return_loss:
            return self.forward_train(bsp_feature,
                                      reference_temporal_iou, train)
        return self.forward_test(bsp_feature)

    def train_step(self, batch, train: bool = True):
        losses = self.forward_train(batch['bsp_feature'],
                                    batch['reference_temporal_iou'],
                                    train=train)
        return parse_losses_localizer(losses)

    def proposals_from_outputs(self, pem_scores, tmin, tmax, tmin_score,
                               tmax_score, video_info):
        """Host post-processing (reference bsn.py:353-380)."""
        pem_scores = np.asarray(pem_scores).reshape(-1, 1)
        tmin = np.asarray(tmin).reshape(-1, 1)
        tmax = np.asarray(tmax).reshape(-1, 1)
        tmin_score = np.asarray(tmin_score).reshape(-1, 1)
        tmax_score = np.asarray(tmax_score).reshape(-1, 1)
        score = pem_scores * tmin_score * tmax_score
        result = np.concatenate(
            (tmin, tmax, tmin_score, tmax_score, pem_scores, score),
            axis=1)
        return post_processing(result, video_info, self.soft_nms_alpha,
                               self.soft_nms_low_threshold,
                               self.soft_nms_high_threshold,
                               self.post_process_top_k,
                               self.feature_extraction_interval)
