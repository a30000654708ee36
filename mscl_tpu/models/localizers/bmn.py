"""BMN — Boundary-Matching Network temporal action proposal generator.

Parity: reference mmaction/models/localizers/bmn.py:15-417 — 1D base/
start/end convs (groups=4), boundary-matching sampling as a precomputed
interp mask matmul, 3D+2D proposal-evaluation convs, BMNLoss training and
soft-NMS proposal post-processing (host side,
localization/proposal_utils.py).

Features are (B, tscale, feat_dim) channel-last; the interp sample mask
matmul ('bct,ts->bcs') is a clean MXU op.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import LOSSES, RECOGNIZERS, build_loss
from ...localization.proposal_utils import (post_processing, temporal_iop,
                                            temporal_iou)
from .base import parse_losses_localizer


def _interp1d_bin_mask(seg_tmin, seg_tmax, tscale, num_samples,
                       num_samples_per_bin):
    """(reference bmn.py:358-381)."""
    plen = float(seg_tmax - seg_tmin)
    plen_sample = plen / (num_samples * num_samples_per_bin - 1.0)
    total_samples = [seg_tmin + plen_sample * i
                     for i in range(num_samples * num_samples_per_bin)]
    p_mask = []
    for idx in range(num_samples):
        bin_samples = total_samples[idx * num_samples_per_bin:
                                    (idx + 1) * num_samples_per_bin]
        bin_vector = np.zeros(tscale)
        for sample in bin_samples:
            sample_upper = math.ceil(sample)
            sample_decimal, sample_down = math.modf(sample)
            if 0 <= int(sample_down) <= (tscale - 1):
                bin_vector[int(sample_down)] += 1 - sample_decimal
            if 0 <= int(sample_upper) <= (tscale - 1):
                bin_vector[int(sample_upper)] += sample_decimal
        p_mask.append(bin_vector / num_samples_per_bin)
    return np.stack(p_mask, axis=1)


def build_interp1d_mask(tscale, num_samples, num_samples_per_bin,
                        boundary_ratio):
    """(tscale, num_samples * tscale * tscale) sample mask
    (reference bmn.py:383-405)."""
    mask_mat = []
    for start_index in range(tscale):
        mask_mat_vector = []
        for duration_index in range(tscale):
            if start_index + duration_index < tscale:
                p_tmin = start_index
                p_tmax = start_index + duration_index
                center_len = float(p_tmax - p_tmin) + 1
                sample_tmin = p_tmin - center_len * boundary_ratio
                sample_tmax = p_tmax + center_len * boundary_ratio
                p_mask = _interp1d_bin_mask(
                    sample_tmin, sample_tmax, tscale, num_samples,
                    num_samples_per_bin)
            else:
                p_mask = np.zeros([tscale, num_samples])
            mask_mat_vector.append(p_mask)
        mask_mat.append(np.stack(mask_mat_vector, axis=2))
    mask = np.stack(mask_mat, axis=3).astype(np.float32)
    return mask.reshape(tscale, -1)


def build_match_map(tscale):
    temporal_gap = 1.0 / tscale
    match_map = []
    for idx in range(tscale):
        match_window = []
        tmin = temporal_gap * idx
        for jdx in range(1, tscale + 1):
            match_window.append([tmin, tmin + temporal_gap * jdx])
        match_map.append(match_window)
    match_map = np.transpose(np.array(match_map), [1, 0, 2])
    return match_map.reshape(-1, 2)


def _conv1d(features, kernel, groups=1, name=None, dtype=jnp.float32):
    return nn.Conv(features, (kernel,), padding=[(kernel // 2,) * 2],
                   feature_group_count=groups, dtype=dtype, name=name)


@RECOGNIZERS.register_module()
class BMN(nn.Module):
    temporal_dim: int = 100
    boundary_ratio: float = 0.5
    num_samples: int = 32
    num_samples_per_bin: int = 3
    feat_dim: int = 400
    soft_nms_alpha: float = 0.4
    soft_nms_low_threshold: float = 0.5
    soft_nms_high_threshold: float = 0.9
    post_process_top_k: int = 100
    feature_extraction_interval: int = 16
    loss_cls: Any = None
    hidden_dim_1d: int = 256
    hidden_dim_2d: int = 128
    hidden_dim_3d: int = 512
    train_cfg: Any = None
    test_cfg: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        self.sample_mask = jnp.asarray(build_interp1d_mask(
            self.temporal_dim, self.num_samples,
            self.num_samples_per_bin, self.boundary_ratio))
        bm = np.array([[1] * (self.temporal_dim - idx) + [0] * idx
                       for idx in range(self.temporal_dim)],
                      dtype=np.float32)
        self.bm_mask = jnp.asarray(bm)
        self._loss = build_loss(dict(self.loss_cls or
                                     dict(type='BMNLoss')))

    @nn.compact
    def _forward(self, x, train: bool = False):
        """x: (B, tscale, feat_dim) -> (confidence (B, T, T, 2),
        start (B, T), end (B, T))."""
        h = self.hidden_dim_1d
        base = nn.relu(_conv1d(h, 3, 4, 'b1', self.dtype)(x))
        base = nn.relu(_conv1d(h, 3, 4, 'b2', self.dtype)(base))

        start = nn.relu(_conv1d(h, 3, 4, 's1', self.dtype)(base))
        start = nn.sigmoid(_conv1d(1, 1, 1, 's2', self.dtype)(start))
        end = nn.relu(_conv1d(h, 3, 4, 'e1', self.dtype)(base))
        end = nn.sigmoid(_conv1d(1, 1, 1, 'e2', self.dtype)(end))

        conf = nn.relu(_conv1d(h, 3, 4, 'p1', self.dtype)(base))
        # boundary matching: (B, T, C) x (T, S*T*T) -> (B, C, S, T, T)
        b, t, c = conf.shape
        bm = jnp.einsum('btc,ts->bcs', conf, self.sample_mask)
        bm = bm.reshape(b, c, self.num_samples, t, t)
        # 3D conv over samples -> collapse: NTHWC layout (B, S, T, T, C)
        bm = jnp.transpose(bm, (0, 2, 3, 4, 1))
        bm = nn.Conv(self.hidden_dim_3d, (self.num_samples, 1, 1),
                     padding='VALID', dtype=self.dtype, name='p3d')(bm)
        bm = nn.relu(bm).squeeze(1)      # (B, T, T, hidden3d)
        bm = nn.relu(nn.Conv(self.hidden_dim_2d, (1, 1),
                             dtype=self.dtype, name='p2d_1')(bm))
        bm = nn.relu(nn.Conv(self.hidden_dim_2d, (3, 3),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             name='p2d_2')(bm))
        bm = nn.relu(nn.Conv(self.hidden_dim_2d, (3, 3),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             name='p2d_3')(bm))
        bm = nn.sigmoid(nn.Conv(2, (1, 1), dtype=self.dtype,
                                name='p2d_4')(bm))
        return bm, start.squeeze(-1), end.squeeze(-1)

    def forward_train(self, raw_feature, label_confidence, label_start,
                      label_end, train: bool = True) -> Dict:
        conf, start, end = self._forward(raw_feature, train)
        total, tem, pem_reg, pem_cls = self._loss(
            conf, start, end, label_confidence, label_start, label_end,
            self.bm_mask, self.make_rng('moco'))
        return dict(loss=total, loss_tem=tem, loss_pem_reg=pem_reg,
                    loss_pem_cls=pem_cls)

    def forward_test(self, raw_feature):
        conf, start, end = self._forward(raw_feature, train=False)
        return conf, start, end

    def __call__(self, raw_feature, train: bool = False,
                 return_loss: bool = False, **labels):
        if return_loss:
            return self.forward_train(raw_feature, train=train, **labels)
        return self.forward_test(raw_feature)

    def train_step(self, batch, train: bool = True):
        losses = self.forward_train(
            batch['raw_feature'], batch['label_confidence'],
            batch['label_start'], batch['label_end'], train=train)
        return parse_losses_localizer(losses)

    # ------------------------------------------------- host-side helpers
    def generate_labels(self, gt_bbox):
        """Host numpy label generation (reference bmn.py:285-338)."""
        match_map = build_match_map(self.temporal_dim)
        tgap = 1.0 / self.temporal_dim
        anchors_tmins = np.arange(self.temporal_dim) * tgap
        anchors_tmaxs = anchors_tmins + tgap
        conf_list, start_list, end_list = [], [], []
        for every_gt_bbox in gt_bbox:
            every_gt_bbox = np.asarray(every_gt_bbox, np.float32)
            gt_iou_map = np.max(np.stack([
                temporal_iou(match_map[:, 0], match_map[:, 1], s, e)
                .reshape(self.temporal_dim, self.temporal_dim)
                for s, e in every_gt_bbox]), axis=0)
            gt_tmins = every_gt_bbox[:, 0]
            gt_tmaxs = every_gt_bbox[:, 1]
            pad = 3 * tgap
            starts = np.stack([gt_tmins - pad / 2, gt_tmins + pad / 2],
                              axis=1)
            ends = np.stack([gt_tmaxs - pad / 2, gt_tmaxs + pad / 2],
                            axis=1)
            ms = [np.max(temporal_iop(tmin, tmax, starts[:, 0],
                                      starts[:, 1]))
                  for tmin, tmax in zip(anchors_tmins, anchors_tmaxs)]
            me = [np.max(temporal_iop(tmin, tmax, ends[:, 0],
                                      ends[:, 1]))
                  for tmin, tmax in zip(anchors_tmins, anchors_tmaxs)]
            conf_list.append(gt_iou_map.astype(np.float32))
            start_list.append(np.array(ms, np.float32))
            end_list.append(np.array(me, np.float32))
        return (np.stack(conf_list), np.stack(start_list),
                np.stack(end_list))

    def proposals_from_outputs(self, conf, start, end, video_info):
        """Host post-processing for one video (reference
        bmn.py:215-284)."""
        start_scores = np.asarray(start)
        end_scores = np.asarray(end)
        reg_conf = np.asarray(conf[..., 0])
        cls_conf = np.asarray(conf[..., 1])
        tscale = self.temporal_dim
        max_start, max_end = start_scores.max(), end_scores.max()
        start_bins = np.zeros(tscale)
        end_bins = np.zeros(tscale)
        start_bins[0] = 1
        end_bins[-1] = 1
        for idx in range(1, tscale - 1):
            if start_scores[idx] > start_scores[idx + 1] and \
                    start_scores[idx] > start_scores[idx - 1]:
                start_bins[idx] = 1
            elif start_scores[idx] > 0.5 * max_start:
                start_bins[idx] = 1
            if end_scores[idx] > end_scores[idx + 1] and \
                    end_scores[idx] > end_scores[idx - 1]:
                end_bins[idx] = 1
            elif end_scores[idx] > 0.5 * max_end:
                end_bins[idx] = 1
        new_proposals = []
        for idx in range(tscale):
            for jdx in range(tscale):
                start_index = jdx
                end_index = start_index + idx + 1
                if end_index < tscale and start_bins[start_index] == 1 \
                        and end_bins[end_index] == 1:
                    tmin = start_index / tscale
                    tmax = end_index / tscale
                    score = (start_scores[start_index] *
                             end_scores[end_index] *
                             cls_conf[idx, jdx] * reg_conf[idx, jdx])
                    new_proposals.append([
                        tmin, tmax, start_scores[start_index],
                        end_scores[end_index], cls_conf[idx, jdx],
                        reg_conf[idx, jdx], score])
        if not new_proposals:
            return []
        return post_processing(
            np.stack(new_proposals), video_info, self.soft_nms_alpha,
            self.soft_nms_low_threshold, self.soft_nms_high_threshold,
            self.post_process_top_k, self.feature_extraction_interval)
