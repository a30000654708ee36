"""Recognizer3D — 3D CNN clip classifier (fine-tune / test / retrieval).

Parity: reference mmaction/models/recognizers/recognizer3d.py —
  - forward_train (:13-30): flatten clip dim, backbone -> head -> CE loss
  - _do_test (:32-99): per-clip scores averaged per test_cfg.average_clips
    ('prob' softmax-mean | 'score' mean, reference base.py:224-258)
  - feature extraction (:67-93): spatiotemporal avg-pool, reshape
    (batches, num_segs, -1), temporal mean — the retrieval feature path.

TPU notes: accepts NCTHW batches (reference layout, what the pipeline
emits) and transposes once to NTHWC before the conv stack.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import RECOGNIZERS, BACKBONES, HEADS
from .base import parse_losses


def to_nthwc(imgs: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """(..., C, T, H, W) -> (N, T, H, W, C), flattening leading dims.
    Pass the model dtype to cast BEFORE the transpose — the transpose is
    a real layout copy and bf16 halves its bytes."""
    if dtype is not None:
        imgs = imgs.astype(dtype)
    imgs = imgs.reshape((-1,) + imgs.shape[-4:])
    return jnp.transpose(imgs, (0, 2, 3, 4, 1))


@RECOGNIZERS.register_module()
class Recognizer3D(nn.Module):
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
            raise KeyError(f'unknown backbone {bb_type}')
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

    def extract_feat(self, imgs, train: bool = False):
        feats = self.backbone_m(imgs, train=train)
        # lists are multi-stage outputs (take the last stage); tuples are
        # multi-pathway outputs (SlowFast) consumed whole by the head
        return feats[-1] if isinstance(feats, list) else feats

    def _neck_feat(self, feats, train, labels=None):
        """Run the neck (e.g. TPN, reference recognizer
        base.py with_neck path): multi-stage backbone features -> fused
        feature + train-time auxiliary losses."""
        if not isinstance(feats, (list, tuple)):
            feats = [feats]
        out, aux_losses = self.neck_m(list(feats), train=train,
                                      labels=labels)
        if isinstance(out, (list, tuple)):
            out = out[-1]
        return out, aux_losses

    def forward_train(self, imgs, labels, train: bool = True
                      ) -> Dict[str, jnp.ndarray]:
        imgs = to_nthwc(imgs, self.dtype)
        labels = labels.reshape(-1)
        if self.neck_m is not None:
            feats = self.backbone_m(imgs, train=train)
            x, aux_losses = self._neck_feat(feats, train, labels)
            cls_score = self.cls_head_m(x, train=train)
            losses = dict(self.cls_head_m.loss(cls_score, labels))
            losses.update(aux_losses)
            return losses
        x = self.extract_feat(imgs, train=train)
        cls_score = self.cls_head_m(x, train=train)
        return self.cls_head_m.loss(cls_score, labels)

    def forward_test(self, imgs) -> jnp.ndarray:
        """(B, num_segs, C, T, H, W) -> (B, num_classes) averaged scores."""
        if self.cls_head is None or (self.test_cfg or {}).get(
                'feature_extraction'):
            # headless / feature_extraction configs (reference
            # recognizer3d.py:67-93 feature_extraction branch)
            return self.extract_features_pooled(imgs)
        batches = imgs.shape[0]
        num_segs = imgs.shape[1] if imgs.ndim == 6 else 1
        if self.neck_m is not None:
            feats = self.backbone_m(to_nthwc(imgs, self.dtype), train=False)
            x, _ = self._neck_feat(feats, False)
        else:
            x = self.extract_feat(to_nthwc(imgs, self.dtype), train=False)
        cls_score = self.cls_head_m(x, train=False)
        cls_score = cls_score.reshape(batches, num_segs, -1)
        average_clips = (self.test_cfg or {}).get('average_clips', None)
        if average_clips == 'prob':
            cls_score = jax.nn.softmax(cls_score, axis=-1).mean(axis=1)
        else:  # 'score' or None
            cls_score = cls_score.mean(axis=1)
        return cls_score

    def extract_features_pooled(self, imgs) -> jnp.ndarray:
        """Retrieval feature path (reference recognizer3d.py:67-93):
        global avg-pool each clip feature, mean over segments."""
        batches = imgs.shape[0]
        num_segs = imgs.shape[1] if imgs.ndim == 6 else 1
        feat = self.extract_feat(to_nthwc(imgs, self.dtype), train=False)
        if isinstance(feat, tuple):  # SlowFast pathways: pool + concat
            feat = jnp.concatenate(
                [f.mean(axis=(1, 2, 3)) for f in feat], axis=-1)
        elif feat.ndim == 5:
            feat = feat.mean(axis=(1, 2, 3))
        feat = feat.reshape(batches, num_segs, -1)
        return feat.mean(axis=1)

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
