"""AudioRecognizer — spectrogram classifier.

Parity: reference mmaction/models/recognizers/audio_recognizer.py:7-61 —
flatten (batch, num_clips) spectrograms into the 2D audio backbone's
batch dim; average clip scores at test. Batches arrive NCTF:
(B, num_clips, 1, T, F).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES, HEADS, RECOGNIZERS
from .base import parse_losses


@RECOGNIZERS.register_module()
class AudioRecognizer(nn.Module):
    backbone: Any = None
    cls_head: Any = None
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

    def _clips_ntfc(self, audios):
        # (B, num_clips, C=1, T, F) -> (B*num_clips, T, F, C)
        num_clips = audios.shape[1]
        audios = audios.reshape((-1,) + audios.shape[-3:])
        return jnp.transpose(audios, (0, 2, 3, 1)), num_clips

    def forward_train(self, audios, labels, train: bool = True) -> Dict:
        x, _ = self._clips_ntfc(audios)
        feat = self.backbone_m(x, train=train)
        cls_score = self.cls_head_m(feat, train=train)
        return self.cls_head_m.loss(cls_score, labels.reshape(-1))

    def forward_test(self, audios) -> jnp.ndarray:
        x, num_clips = self._clips_ntfc(audios)
        feat = self.backbone_m(x, train=False)
        cls_score = self.cls_head_m(feat, train=False)
        cls_score = cls_score.reshape(
            (-1, num_clips) + cls_score.shape[1:]).mean(axis=1)
        average_clips = (self.test_cfg or {}).get('average_clips', None)
        if average_clips == 'prob':
            cls_score = jax.nn.softmax(cls_score, axis=-1)
        return cls_score

    def __call__(self, audios, label=None, train: bool = False,
                 return_loss: bool = True):
        if return_loss and label is not None:
            return self.forward_train(audios, label, train=train)
        return self.forward_test(audios)

    def train_step(self, batch, train: bool = True):
        losses = self.forward_train(batch['audios'], batch['label'],
                                    train=train)
        return parse_losses(losses)
