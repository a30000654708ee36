"""Recognizer2D — frame-based recognizer (TSN/TSM family).

Parity: reference mmaction/models/recognizers/recognizer2d.py — flatten
(batch, num_segs) frames into the 2D backbone's batch dim; the head forms
the segment consensus. Batches arrive NCHW-per-segment:
(B, num_segs, C, H, W).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES, HEADS, RECOGNIZERS
from .base import parse_losses


@RECOGNIZERS.register_module()
class Recognizer2D(nn.Module):
    backbone: Any = None
    cls_head: Any = None
    neck: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        bb_cfg = dict(self.backbone)
        bb_type = bb_cfg.pop('type')
        bb_cfg.pop('pretrained', None)
        self.backbone_m = BACKBONES.get(bb_type)(dtype=self.dtype,
                                                 **bb_cfg)
        head_cfg = dict(self.cls_head)
        head_type = head_cfg.pop('type')
        self.cls_head_m = HEADS.get(head_type)(dtype=self.dtype,
                                               **head_cfg)

    def _frames_nhwc(self, imgs):
        # (B, num_segs, C, H, W) -> (B*num_segs, H, W, C)
        num_segs = imgs.shape[1]
        imgs = imgs.reshape((-1,) + imgs.shape[-3:])
        return jnp.transpose(imgs, (0, 2, 3, 1)), num_segs

    def forward_train(self, imgs, labels, train: bool = True) -> Dict:
        x, num_segs = self._frames_nhwc(imgs)
        feat = self.backbone_m(x, train=train)
        if isinstance(feat, (list, tuple)):
            feat = feat[-1]
        labels_flat = labels.reshape(-1)
        from ..heads.reid_distill_heads import _ReidHeadBase
        if isinstance(self.cls_head_m, _ReidHeadBase):
            # reid heads need the targets in-call (cosface margin) and
            # yield the pooled feature the triplet reid loss consumes
            # (reference reid_head.py forward/loss pairing)
            cls_score, reid_feat = self.cls_head_m(
                feat, train=train, num_segs=num_segs, labels=labels_flat,
                return_feat=True)
            return self.cls_head_m.loss(cls_score, labels_flat,
                                        reid_feat=reid_feat)
        cls_score = self.cls_head_m(feat, train=train, num_segs=num_segs)
        return self.cls_head_m.loss(cls_score, labels_flat)

    def forward_test(self, imgs) -> jnp.ndarray:
        x, num_segs = self._frames_nhwc(imgs)
        feat = self.backbone_m(x, train=False)
        if isinstance(feat, (list, tuple)):
            feat = feat[-1]
        cls_score = self.cls_head_m(feat, train=False, num_segs=num_segs)
        average_clips = (self.test_cfg or {}).get('average_clips', None)
        if average_clips == 'prob':
            cls_score = jax.nn.softmax(cls_score, axis=-1)
        return cls_score

    def extract_features_pooled(self, imgs) -> jnp.ndarray:
        x, num_segs = self._frames_nhwc(imgs)
        feat = self.backbone_m(x, train=False)
        if isinstance(feat, (list, tuple)):
            feat = feat[-1]
        feat = feat.mean(axis=(1, 2))
        return feat.reshape(-1, num_segs, feat.shape[-1]).mean(axis=1)

    def __call__(self, imgs, labels=None, train: bool = False,
                 return_loss: bool = True):
        if return_loss and labels is not None:
            return self.forward_train(imgs, labels, train=train)
        return self.forward_test(imgs)

    def train_step(self, batch, train: bool = True):
        losses = self.forward_train(batch['imgs'], batch['label'],
                                    train=train)
        loss, log_vars = parse_losses(losses)
        return loss, log_vars
