"""BMN / binary logistic regression losses.

Parity: reference mmaction/models/losses/bmn_loss.py and
binary_logistic_regression_loss.py — weighted sum of temporal evaluation
(start/end) logistic losses, proposal regression MSE over balanced random
samples, and proposal classification logistic loss.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..builder import LOSSES


def binary_logistic_regression_loss(reg_score, label,
                                    threshold=0.5,
                                    ratio_range=(1.05, 21), eps=1e-5):
    """Class-balanced binary logistic loss (reference
    binary_logistic_regression_loss.py)."""
    score = reg_score.reshape(-1)
    label = label.reshape(-1)
    pmask = (label > threshold).astype(jnp.float32)
    num_positive = jnp.maximum(pmask.sum(), 1.0)
    num_entries = label.shape[0]
    ratio = jnp.clip(num_entries / num_positive, ratio_range[0],
                     ratio_range[1])
    coef_0 = 0.5 * ratio / (ratio - 1)
    coef_1 = 0.5 * ratio
    loss = coef_1 * pmask * jnp.log(score + eps) + \
        coef_0 * (1.0 - pmask) * jnp.log(1.0 - score + eps)
    return -loss.mean()


@LOSSES.register_module()
class BinaryLogisticRegressionLoss:

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, reg_score, label, threshold=0.5,
                 ratio_range=(1.05, 21), eps=1e-5):
        return self.loss_weight * binary_logistic_regression_loss(
            reg_score, label, threshold, ratio_range, eps)


@LOSSES.register_module()
class BMNLoss:
    """reference bmn_loss.py — __call__(pred_bm, pred_start, pred_end,
    gt_iou_map, gt_start, gt_end, bm_mask, rng) -> (total, tem, pem_reg,
    pem_cls). The balanced-sampling randomness uses an explicit rng."""

    @staticmethod
    def tem_loss(pred_start, pred_end, gt_start, gt_end):
        return binary_logistic_regression_loss(pred_start, gt_start) + \
            binary_logistic_regression_loss(pred_end, gt_end)

    @staticmethod
    def pem_reg_loss(rng, pred_score, gt_iou_map, mask,
                     high_temporal_iou_threshold=0.7,
                     low_temporal_iou_threshold=0.3):
        u_hmask = (gt_iou_map > high_temporal_iou_threshold).astype(
            jnp.float32)
        u_mmask = ((gt_iou_map <= high_temporal_iou_threshold) &
                   (gt_iou_map > low_temporal_iou_threshold)).astype(
                       jnp.float32)
        u_lmask = ((gt_iou_map <= low_temporal_iou_threshold) &
                   (gt_iou_map > 0.)).astype(jnp.float32) * mask
        num_h = u_hmask.sum()
        num_m = jnp.maximum(u_mmask.sum(), 1.0)
        num_l = jnp.maximum(u_lmask.sum(), 1.0)
        k1, k2 = jax.random.split(rng)
        r_m = num_h / num_m
        u_smmask = u_mmask * jax.random.uniform(k1, gt_iou_map.shape)
        u_smmask = (u_smmask > (1.0 - r_m)).astype(jnp.float32)
        r_l = num_h / num_l
        u_slmask = u_lmask * jax.random.uniform(k2, gt_iou_map.shape)
        u_slmask = (u_slmask > (1.0 - r_l)).astype(jnp.float32)
        weights = u_hmask + u_smmask + u_slmask
        mse = ((pred_score * weights - gt_iou_map * weights) ** 2).mean()
        return 0.5 * mse * weights.size / jnp.maximum(weights.sum(), 1.0)

    @staticmethod
    def pem_cls_loss(pred_score, gt_iou_map, mask, threshold=0.9,
                     ratio_range=(1.05, 21), eps=1e-5):
        pmask = (gt_iou_map > threshold).astype(jnp.float32)
        nmask = (gt_iou_map <= threshold).astype(jnp.float32) * mask
        num_positive = jnp.maximum(pmask.sum(), 1.0)
        num_entries = num_positive + nmask.sum()
        ratio = jnp.clip(num_entries / num_positive, ratio_range[0],
                         ratio_range[1])
        coef_0 = 0.5 * ratio / (ratio - 1)
        coef_1 = 0.5 * ratio
        loss_pos = coef_1 * jnp.log(pred_score + eps) * pmask
        loss_neg = coef_0 * jnp.log(1.0 - pred_score + eps) * nmask
        return -(loss_pos.sum() + loss_neg.sum()) / num_entries

    def __call__(self, pred_bm, pred_start, pred_end, gt_iou_map,
                 gt_start, gt_end, bm_mask, rng,
                 weight_tem=1.0, weight_pem_reg=10.0,
                 weight_pem_cls=1.0):
        pred_bm_reg = pred_bm[:, ..., 0] if pred_bm.shape[-1] == 2 else \
            pred_bm[:, 0]
        pred_bm_cls = pred_bm[:, ..., 1] if pred_bm.shape[-1] == 2 else \
            pred_bm[:, 1]
        gt_iou_map = gt_iou_map * bm_mask
        pem_reg = self.pem_reg_loss(rng, pred_bm_reg, gt_iou_map, bm_mask)
        pem_cls = self.pem_cls_loss(pred_bm_cls, gt_iou_map, bm_mask)
        tem = self.tem_loss(pred_start, pred_end, gt_start, gt_end)
        total = weight_tem * tem + weight_pem_reg * pem_reg + \
            weight_pem_cls * pem_cls
        return total, tem, pem_reg, pem_cls
