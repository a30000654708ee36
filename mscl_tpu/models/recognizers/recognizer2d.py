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
        factory = BACKBONES.get(bb_type)
        if factory is None:
            raise KeyError(
                f'unknown backbone {bb_type!r} (external torchvision/'
                f'timm/mmcls backbones are not in the registry)')
        self.backbone_m = factory(dtype=self.dtype, **bb_cfg)
        if self.neck is not None:
            from ..builder import NECKS
            neck_cfg = dict(self.neck)
            neck_type = neck_cfg.pop('type')
            self.neck_m = NECKS.get(neck_type)(dtype=self.dtype,
                                               **neck_cfg)
        else:
            self.neck_m = None
        if self.cls_head is not None:
            head_cfg = dict(self.cls_head)
            head_type = head_cfg.pop('type')
            self.cls_head_m = HEADS.get(head_type)(dtype=self.dtype,
                                                   **head_cfg)
        else:
            # headless feature-extraction config (reference
            # tsn_r50_clip_feature_extraction_*: cls_head absent,
            # test_cfg.feature_extraction=True)
            self.cls_head_m = None

    def _neck_feat(self, feat, num_segs, train, labels=None):
        """TPN-over-2D path (reference recognizer2d.py with_neck: each
        level's (B*segs, H, W, C) frames fold back into a temporal axis
        before the 3D neck; the fused feature feeds the head with
        num_segs=1)."""
        levels = feat if isinstance(feat, (list, tuple)) else [feat]
        levels = [f.reshape((-1, num_segs) + f.shape[1:])
                  for f in levels]                    # (B, T=segs, H, W, C)
        out, aux_losses = self.neck_m(list(levels), train=train,
                                      labels=labels)
        if isinstance(out, (list, tuple)):
            out = out[-1]
        return out, aux_losses

    def _frames_nhwc(self, imgs):
        # (B, num_segs, C, H, W) -> (B*num_segs, H, W, C); cast to the
        # model dtype BEFORE the transpose (a real layout copy — bf16
        # halves its bytes)
        num_segs = imgs.shape[1]
        imgs = imgs.astype(self.dtype).reshape((-1,) + imgs.shape[-3:])
        return jnp.transpose(imgs, (0, 2, 3, 1)), num_segs

    def forward_train(self, imgs, labels, train: bool = True) -> Dict:
        if self.cls_head_m is None:
            raise ValueError('Recognizer2D built without cls_head (a '
                             'feature-extraction config) cannot train')
        x, num_segs = self._frames_nhwc(imgs)
        feat = self.backbone_m(x, train=train)
        labels_flat = labels.reshape(-1)
        if self.neck_m is not None:
            fused, aux_losses = self._neck_feat(feat, num_segs, train,
                                                labels_flat)
            cls_score = self.cls_head_m(fused, train=train, num_segs=1)
            losses = dict(self.cls_head_m.loss(cls_score, labels_flat))
            losses.update(aux_losses)
            return losses
        if isinstance(feat, (list, tuple)):
            feat = feat[-1]
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
        if self.cls_head_m is None or (self.test_cfg or {}).get(
                'feature_extraction'):
            # headless / feature_extraction configs: the test path
            # returns pooled features (reference recognizer2d.py
            # feature_extraction branch)
            return self.extract_features_pooled(imgs)
        x, num_segs = self._frames_nhwc(imgs)
        feat = self.backbone_m(x, train=False)
        if self.neck_m is not None:
            feat, _ = self._neck_feat(feat, num_segs, False)
            cls_score = self.cls_head_m(feat, train=False, num_segs=1)
            average_clips = (self.test_cfg or {}).get('average_clips')
            if average_clips == 'prob':
                cls_score = jax.nn.softmax(cls_score, axis=-1)
            return cls_score
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
