"""AVA spatio-temporal detection stack (compact round-1 version).

Parity targets:
  - SingleRoIExtractor3D (reference mmaction/models/roi_extractors/
    single_straight3d.py:28-128): temporal pool the 3D feature map, run
    per-frame RoIAlign, optional global-feature concat.
  - BBoxHeadAVA (reference mmaction/models/heads/bbox_head.py:15-200):
    temporal+spatial pooled RoI feature -> fc; focal BCE multilabel loss
    and recall/precision@thr/topk metrics.
  - AVAFastRCNN training path: proposals + assigned multilabel targets are
    produced host-side (the mmdet assigner/sampler machinery is a round-2
    item); the jitted step consumes fixed-size padded RoI batches.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .builder import BACKBONES, HEADS, RECOGNIZERS
from .recognizers.base import parse_losses
from .recognizers.recognizer3d import to_nthwc
from ..ops.roi_align import roi_align


def merge_pathways(feat, with_temporal_pool: bool = True,
                   temporal_pool_mode: str = 'avg') -> jnp.ndarray:
    """SlowFast pathway merge + temporal pool (reference
    single_straight3d.py:75-93 and acrn misc_head.py do the same dance):
    nearest-resize every pathway to the largest T and the first
    pathway's spatial shape, optionally temporal-pool, concat
    channels. Single tensors just get the pool."""
    feats = feat if isinstance(feat, (tuple, list)) else (feat,)
    if len(feats) >= 2:
        max_t = max(f.shape[1] for f in feats)
        h, w = feats[0].shape[2], feats[0].shape[3]
        feats = [
            f if f.shape[1:4] == (max_t, h, w) else jax.image.resize(
                f, (f.shape[0], max_t, h, w, f.shape[-1]),
                method='nearest')
            for f in feats
        ]
    if with_temporal_pool:
        if temporal_pool_mode == 'avg':
            feats = [f.mean(axis=1, keepdims=True) for f in feats]
        else:
            feats = [f.max(axis=1, keepdims=True) for f in feats]
    return feats[0] if len(feats) == 1 else jnp.concatenate(feats,
                                                            axis=-1)


@HEADS.register_module()
class SingleRoIExtractor3D(nn.Module):
    roi_layer_type: str = 'RoIAlign'
    featmap_stride: int = 16
    output_size: int = 8
    sampling_ratio: int = 2
    pool_mode: str = 'avg'
    aligned: bool = True
    with_temporal_pool: bool = True
    temporal_pool_mode: str = 'avg'
    with_global: bool = False

    @nn.compact
    def __call__(self, feat, rois: jnp.ndarray):
        """feat: (N, T, H, W, C) or a (slow, fast) pathway tuple
        (SlowFast backbones); rois: (R, 5). Returns
        (R, T', output, output, C)."""
        feat = merge_pathways(feat, self.with_temporal_pool,
                              self.temporal_pool_mode)
        t = feat.shape[1]
        roi_feats = []
        for i in range(t):
            rf = roi_align(feat[:, i], rois, self.output_size,
                           1.0 / self.featmap_stride,
                           self.sampling_ratio, self.aligned)
            if self.with_global:
                inds = rois[:, 0].astype(jnp.int32)
                gf = jax.image.resize(
                    feat[:, i],
                    (feat.shape[0], self.output_size, self.output_size,
                     feat.shape[-1]), method='linear')[inds]
                rf = jnp.concatenate([rf, gf], axis=-1)
            roi_feats.append(rf)
        return jnp.stack(roi_feats, axis=1)


@HEADS.register_module()
class BBoxHeadAVA(nn.Module):
    temporal_pool_type: str = 'avg'
    spatial_pool_type: str = 'max'
    in_channels: int = 2048
    focal_gamma: float = 0.0
    focal_alpha: float = 1.0
    num_classes: int = 81
    dropout_ratio: float = 0.0
    dropout_before_pool: bool = True
    topk: Tuple[int, ...] = (3, 5)
    multilabel: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (R, T, h, w, C) RoI features -> (R, num_classes) logits.
        Already-pooled (R, C) features (FBOHead output) pass through."""
        if self.dropout_before_pool and self.dropout_ratio > 0:
            x = nn.Dropout(rate=self.dropout_ratio,
                           deterministic=not train)(x)
        if x.ndim == 5:
            x = x.mean(axis=1) if self.temporal_pool_type == 'avg' \
                else x.max(axis=1)
            x = x.mean(axis=(1, 2)) if self.spatial_pool_type == 'avg' \
                else x.max(axis=(1, 2))
        if not self.dropout_before_pool and self.dropout_ratio > 0:
            x = nn.Dropout(rate=self.dropout_ratio,
                           deterministic=not train)(x)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(0.01),
                        bias_init=nn.initializers.zeros,
                        dtype=self.dtype, name='fc_cls')(x)

    def loss(self, cls_score, labels, valid_mask=None) -> Dict:
        """Focal BCE over multilabel targets, first class (pos/neg)
        excluded from the loss (reference bbox_head.py:169-201).

        Reference semantics, expressed with static-shape masking:
        only RoIs with >=1 positive label contribute (reference
        ``pos_inds = labels.sum(-1) > 0`` at bbox_head.py:183), and the
        reduction is ``torch.mean`` over all (roi, class) elements of
        the kept rows — NOT a sum over classes."""
        score = cls_score[:, 1:]
        target = labels[:, 1:]
        pos = (target.sum(axis=-1) > 0).astype(score.dtype)
        if valid_mask is not None:
            pos = pos * valid_mask
        n_valid = jnp.maximum(pos.sum(), 1.0)
        p = jax.nn.sigmoid(score)
        bce = jnp.maximum(score, 0) - score * target + \
            jnp.log1p(jnp.exp(-jnp.abs(score)))
        pt = jnp.where(target > 0.5, p, 1 - p)
        focal = self.focal_alpha * ((1 - pt) ** self.focal_gamma) * bce
        # element-wise mean over valid (roi, class) entries
        loss = (focal * pos[:, None]).sum() / (n_valid * score.shape[1])
        losses = {'loss_action_cls': loss}

        def row_mean(v):  # mean over valid RoIs only
            return jax.lax.stop_gradient((v * pos).sum() / n_valid)

        pred_vec = (p > 0.5)
        target_vec = target > 0.5
        tsum = jnp.maximum(target_vec.sum(axis=1), 1)
        correct = (pred_vec & target_vec).sum(axis=1)
        losses['recall@thr=0.5'] = row_mean(correct / tsum)
        losses['prec@thr=0.5'] = row_mean(
            correct / jnp.maximum(pred_vec.sum(axis=1), 1e-6))
        for k in self.topk:
            _, idx = jax.lax.top_k(p, k)
            onehot = jnp.zeros_like(p).at[
                jnp.arange(p.shape[0])[:, None], idx].set(1.0) > 0.5
            ck = (onehot & target_vec).sum(axis=1)
            losses[f'recall@top{k}'] = row_mean(ck / tsum)
            losses[f'prec@top{k}'] = row_mean(ck / k)
        return losses


@RECOGNIZERS.register_module()
class AVAFastRCNN(nn.Module):
    """Fast-RCNN-style AVA action detector: 3D backbone -> RoI extract ->
    multilabel action head. Proposals and multilabel targets come from
    the batch (host-side assignment)."""
    backbone: Any = None
    roi_head: Any = None       # dict(bbox_roi_extractor=..., bbox_head=...)
    train_cfg: Any = None
    test_cfg: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        bb_cfg = dict(self.backbone)
        bb_type = bb_cfg.pop('type')
        bb_cfg.pop('pretrained', None)
        self.backbone_m = BACKBONES.get(bb_type)(dtype=self.dtype,
                                                 **bb_cfg)
        rh = dict(self.roi_head or {})
        ext_cfg = dict(rh.get('bbox_roi_extractor',
                              dict(type='SingleRoIExtractor3D')))
        ext_cfg.pop('type', None)
        self.roi_extractor = SingleRoIExtractor3D(**ext_cfg)
        # optional shared head between RoI extraction and bbox head:
        # ACRNHead (actor-context relation, reference misc_head.py) or
        # FBOHead (long-term feature bank, reference fbo_head.py)
        sh_cfg = rh.get('shared_head')
        if sh_cfg and sh_cfg.get('type') == 'LFBInferHead':
            # host-side feature collector (reference lfb_infer_head.py):
            # in-graph the RoI features pass through unchanged; the
            # collection runs outside jit via heads/lfb.py::LFBInferHead
            self.shared_head = None
            self.shared_head_type = 'LFBInferHead'
        elif sh_cfg:
            sh_cfg = dict(sh_cfg)
            sh_type = sh_cfg.pop('type')
            from .heads.lfb import ACRNHead, FBOHead
            sh_cfg.pop('lfb_cfg', None)   # LFB is a host-side bank
            sh_cls = {'ACRNHead': ACRNHead, 'FBOHead': FBOHead}[sh_type]
            self.shared_head = sh_cls(dtype=self.dtype, **sh_cfg)
            self.shared_head_type = sh_type
        else:
            self.shared_head = None
            self.shared_head_type = None
        head_cfg = dict(rh.get('bbox_head', dict(type='BBoxHeadAVA')))
        head_cfg.pop('type', None)
        self.bbox_head = BBoxHeadAVA(dtype=self.dtype, **head_cfg)

    def extract_feat(self, imgs, train=False):
        feats = self.backbone_m(to_nthwc(imgs, self.dtype), train=train)
        return feats[-1] if isinstance(feats, list) else feats

    def _roi_feats(self, feat, rois, train, lt_feat=None):
        roi_feats = self.roi_extractor(feat, rois)
        if self.shared_head_type == 'ACRNHead':
            ctx = merge_pathways(feat,
                                 self.roi_extractor.with_temporal_pool,
                                 self.roi_extractor.temporal_pool_mode)
            roi_feats = self.shared_head(roi_feats, ctx, rois,
                                         train=train)
        elif self.shared_head_type == 'FBOHead':
            if lt_feat is None:   # empty bank: the RoI's own pooled feat
                lt_feat = roi_feats.max(axis=(2, 3)).mean(
                    axis=1, keepdims=True)
            roi_feats = self.shared_head(roi_feats, lt_feat, train=train)
        return roi_feats

    def forward_train(self, imgs, rois, labels, valid_mask=None,
                      train: bool = True, lt_feat=None) -> Dict:
        feat = self.extract_feat(imgs, train)
        roi_feats = self._roi_feats(feat, rois, train, lt_feat)
        cls_score = self.bbox_head(roi_feats, train=train)
        return self.bbox_head.loss(cls_score, labels, valid_mask)

    @staticmethod
    def flatten_rois(rois):
        """(B, R, 4) padded per-sample boxes -> (B*R, 5) with batch
        indices (the reference's mmdet bbox2roi, done inside jit with
        static shapes)."""
        b, r, _ = rois.shape
        batch_ids = jnp.repeat(jnp.arange(b, dtype=rois.dtype), r)
        return jnp.concatenate(
            [batch_ids[:, None], rois.reshape(b * r, 4)], axis=1)

    def forward_test(self, imgs, rois, lt_feat=None):
        feat = self.extract_feat(imgs, train=False)
        roi_feats = self._roi_feats(feat, rois, False, lt_feat)
        return jax.nn.sigmoid(self.bbox_head(roi_feats, train=False))

    def __call__(self, imgs, rois, labels=None, train: bool = False,
                 return_loss: bool = True, **kwargs):
        if return_loss and labels is not None:
            return self.forward_train(imgs, rois, labels, train=train)
        return self.forward_test(imgs, rois)

    def train_step(self, batch, train: bool = True):
        """Accepts either the flat form (rois (R, 5) + labels (R, C)) or
        the pipeline's batched padded form from AVAAssignSample
        (rois (B, R, 4) + roi_labels (B, R, C) + roi_weights (B, R))."""
        rois = batch.get('rois')
        if rois is None:
            raise KeyError('detection train_step needs "rois" in the batch')
        if rois is not None and rois.ndim == 3:
            b, r = rois.shape[:2]
            labels = batch['roi_labels'].reshape(b * r, -1)
            weights = batch['roi_weights'].reshape(b * r)
            losses = self.forward_train(
                batch['imgs'], self.flatten_rois(rois), labels,
                (weights > 0).astype(labels.dtype), train=train)
        else:
            losses = self.forward_train(batch['imgs'], rois,
                                        batch['labels'],
                                        batch.get('valid_mask'),
                                        train=train)
        return parse_losses(losses)


@RECOGNIZERS.register_module()
class FastRCNN(AVAFastRCNN):
    """mmdet-style detector entry point.

    The reference dispatches ``type='FastRCNN'`` to mmdet
    (reference mmaction/models/builder.py:83-86); its AVA configs describe
    the model as ``roi_head=dict(type='AVARoIHead',
    bbox_roi_extractor=..., bbox_head=..., shared_head=...)`` plus
    ``train_cfg.rcnn`` assigner/sampler settings
    (reference configs/detection/_base_/models/slowonly_r50.py:3-42).
    AVAFastRCNN already consumes exactly that nested cfg shape (its setup
    pops the inner ``type`` keys and ignores ``roi_head.type``), so the
    mmdet name is an alias: every reference detection config builds
    through it unchanged. The host-side MaxIoUAssignerAVA/RandomSampler
    machinery lives in core/bbox.py + the AVAAssignSample pipeline and
    reads the same ``train_cfg.rcnn`` dict.
    """
