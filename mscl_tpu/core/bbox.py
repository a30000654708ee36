"""Host-side bbox assignment/sampling for AVA detection training.

TPU-native redesign of the reference's mmdet-based RoI training machinery
(reference mmaction/core/bbox/assigners/max_iou_assigner_ava.py,
mmaction/core/bbox/bbox_target.py, mmdet RandomSampler as configured by
configs/detection/ava/*.py train_cfg.rcnn): the reference assigns and
samples proposals on-GPU inside the RoI head's forward; here it is pure
numpy per-sample data preparation that runs in the input pipeline and
emits FIXED-SIZE padded RoI tensors, so the jitted train step keeps
static shapes.

Semantics (verified against the reference):
  - assignment codes: -1 don't-care, 0 negative, i>0 positive for gt i-1
  - negatives: max_overlap in [0, neg_iou_thr) (or the tuple range)
  - positives: max_overlap >= pos_iou_thr -> argmax gt
  - low-quality matching: each gt claims its best proposal(s) when its
    best IoU >= min_pos_iou (gt_max_assign_all: all ties)
  - multilabel targets: positives copy the (num_classes,) one-hot row of
    their gt; negatives get all-zeros (reference bbox_target pads with 0)
  - RandomSampler: optional add_gt_as_proposals (gts prepend themselves
    as self-assigned positives), int(num*pos_fraction) positives,
    negatives fill to num with a neg_pos_ub cap
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def bbox_overlaps(boxes1: np.ndarray, boxes2: np.ndarray,
                  eps: float = 1e-6) -> np.ndarray:
    """Pairwise IoU, (n, 4) x (k, 4) -> (n, k). x1y1x2y2 convention
    (reference mmaction/core/bbox/iou2d_calculator.py)."""
    n, k = boxes1.shape[0], boxes2.shape[0]
    if n == 0 or k == 0:
        return np.zeros((n, k), np.float32)
    lt = np.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = np.minimum(boxes1[:, None, 2:4], boxes2[None, :, 2:4])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area1 = ((boxes1[:, 2] - boxes1[:, 0]) *
             (boxes1[:, 3] - boxes1[:, 1]))[:, None]
    area2 = ((boxes2[:, 2] - boxes2[:, 0]) *
             (boxes2[:, 3] - boxes2[:, 1]))[None, :]
    return (inter / np.maximum(area1 + area2 - inter, eps)).astype(
        np.float32)


class MaxIoUAssignerAVA:
    """reference max_iou_assigner_ava.py:16-139 (multilabel gt rows)."""

    def __init__(self, pos_iou_thr: float, neg_iou_thr,
                 min_pos_iou: float = 0.0, gt_max_assign_all: bool = True,
                 match_low_quality: bool = True, **kwargs):
        self.pos_iou_thr = pos_iou_thr
        self.neg_iou_thr = neg_iou_thr
        self.min_pos_iou = min_pos_iou
        self.gt_max_assign_all = gt_max_assign_all
        self.match_low_quality = match_low_quality

    def assign(self, proposals: np.ndarray, gt_bboxes: np.ndarray,
               gt_labels: np.ndarray) -> Dict[str, np.ndarray]:
        """proposals (n, 4), gt_bboxes (k, 4), gt_labels (k, C) one-hot.

        Returns dict(gt_inds (n,) int64 in {-1, 0, 1..k},
                     max_overlaps (n,), labels (n, C))."""
        overlaps = bbox_overlaps(gt_bboxes, proposals)  # (k, n)
        num_gts, num_bboxes = overlaps.shape
        gt_inds = np.full((num_bboxes,), -1, np.int64)
        n_classes = gt_labels.shape[1] if gt_labels.ndim == 2 else 0

        if num_gts == 0 or num_bboxes == 0:
            max_overlaps = np.zeros((num_bboxes,), np.float32)
            if num_gts == 0:
                gt_inds[:] = 0
            return dict(gt_inds=gt_inds, max_overlaps=max_overlaps,
                        labels=np.zeros((num_bboxes, n_classes),
                                        np.float32))

        max_overlaps = overlaps.max(axis=0)
        argmax_overlaps = overlaps.argmax(axis=0)
        gt_max_overlaps = overlaps.max(axis=1)
        gt_argmax_overlaps = overlaps.argmax(axis=1)

        if isinstance(self.neg_iou_thr, (int, float)):
            neg = (max_overlaps >= 0) & (max_overlaps < self.neg_iou_thr)
        else:
            lo, hi = self.neg_iou_thr
            neg = (max_overlaps >= lo) & (max_overlaps < hi)
        gt_inds[neg] = 0

        pos = max_overlaps >= self.pos_iou_thr
        gt_inds[pos] = argmax_overlaps[pos] + 1

        if self.match_low_quality:
            for i in range(num_gts):
                if gt_max_overlaps[i] >= self.min_pos_iou:
                    if self.gt_max_assign_all:
                        gt_inds[overlaps[i] == gt_max_overlaps[i]] = i + 1
                    else:
                        gt_inds[gt_argmax_overlaps[i]] = i + 1

        labels = np.zeros((num_bboxes, n_classes), np.float32)
        pos_mask = gt_inds > 0
        if pos_mask.any():
            labels[pos_mask] = gt_labels[gt_inds[pos_mask] - 1]
        return dict(gt_inds=gt_inds, max_overlaps=max_overlaps,
                    labels=labels)


class RandomSampler:
    """mmdet RandomSampler semantics as configured by the AVA configs
    (num=32, pos_fraction=1, neg_pos_ub=-1, add_gt_as_proposals=True)."""

    def __init__(self, num: int, pos_fraction: float,
                 neg_pos_ub: int = -1, add_gt_as_proposals: bool = True,
                 **kwargs):
        self.num = num
        self.pos_fraction = pos_fraction
        self.neg_pos_ub = neg_pos_ub
        self.add_gt_as_proposals = add_gt_as_proposals

    def sample(self, assign: Dict[str, np.ndarray], proposals: np.ndarray,
               gt_bboxes: np.ndarray, gt_labels: np.ndarray,
               rng: Optional[np.random.Generator] = None
               ) -> Dict[str, np.ndarray]:
        rng = rng or np.random.default_rng()
        gt_inds = assign['gt_inds']
        labels = assign['labels']
        if self.add_gt_as_proposals and len(gt_bboxes) > 0:
            # gts prepend themselves as self-assigned positives
            # (mmdet AssignResult.add_gt_)
            proposals = np.concatenate([gt_bboxes, proposals], axis=0)
            gt_inds = np.concatenate(
                [np.arange(1, len(gt_bboxes) + 1), gt_inds])
            labels = np.concatenate([gt_labels, labels], axis=0)

        pos_inds = np.flatnonzero(gt_inds > 0)
        neg_inds = np.flatnonzero(gt_inds == 0)
        num_expected_pos = int(self.num * self.pos_fraction)
        if len(pos_inds) > num_expected_pos:
            pos_inds = rng.choice(pos_inds, num_expected_pos,
                                  replace=False)
        num_expected_neg = self.num - len(pos_inds)
        if self.neg_pos_ub >= 0:
            num_expected_neg = min(
                num_expected_neg, self.neg_pos_ub * max(1, len(pos_inds)))
        if len(neg_inds) > num_expected_neg:
            neg_inds = rng.choice(neg_inds, num_expected_neg,
                                  replace=False)
        return dict(pos_bboxes=proposals[pos_inds],
                    neg_bboxes=proposals[neg_inds],
                    pos_labels=labels[pos_inds])


def bbox_target(pos_bboxes: np.ndarray, neg_bboxes: np.ndarray,
                pos_labels: np.ndarray, num: int, num_classes: int,
                pos_weight: float = 1.0
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad sampled boxes/labels to a fixed budget of ``num`` RoIs
    (reference bbox_target.py:5-42, plus explicit padding so the jitted
    step sees static shapes). Returns (rois (num, 4), labels
    (num, num_classes), weights (num,)) with weights 0 on padding."""
    pos_weight = 1.0 if pos_weight <= 0 else pos_weight
    n_pos, n_neg = len(pos_bboxes), len(neg_bboxes)
    rois = np.zeros((num, 4), np.float32)
    labels = np.zeros((num, num_classes), np.float32)
    weights = np.zeros((num,), np.float32)
    if n_pos:
        rois[:n_pos] = pos_bboxes[:, :4]
        labels[:n_pos] = pos_labels
        weights[:n_pos] = pos_weight
    if n_neg:
        rois[n_pos:n_pos + n_neg] = neg_bboxes[:, :4]
        weights[n_pos:n_pos + n_neg] = 1.0
    return rois, labels, weights


def assign_and_sample(proposals: np.ndarray, gt_bboxes: np.ndarray,
                      gt_labels: np.ndarray, rcnn_cfg: Dict,
                      rng: Optional[np.random.Generator] = None
                      ) -> Dict[str, np.ndarray]:
    """One-call pipeline step: assigner -> sampler -> padded targets,
    per the train_cfg.rcnn dict of the reference AVA configs."""
    assigner_cfg = dict(rcnn_cfg['assigner'])
    assigner_cfg.pop('type', None)
    sampler_cfg = dict(rcnn_cfg['sampler'])
    sampler_cfg.pop('type', None)
    assigner = MaxIoUAssignerAVA(**assigner_cfg)
    sampler = RandomSampler(**sampler_cfg)
    assign = assigner.assign(proposals[:, :4], gt_bboxes, gt_labels)
    sampled = sampler.sample(assign, proposals[:, :4], gt_bboxes,
                             gt_labels, rng)
    rois, labels, weights = bbox_target(
        sampled['pos_bboxes'], sampled['neg_bboxes'],
        sampled['pos_labels'], num=sampler.num,
        num_classes=gt_labels.shape[1],
        pos_weight=rcnn_cfg.get('pos_weight', 1.0))
    return dict(rois=rois, roi_labels=labels, roi_weights=weights)
