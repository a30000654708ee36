"""SSN — Structured Segment Network (training path: STPP + three heads).

Parity: reference mmaction/models/localizers/ssn.py:29-135,
mmaction/models/heads/ssn_head.py (STPPTrain :38-126, SSNHead :280-360)
and mmaction/models/losses/ssn_loss.py — activity CE over
positive+background proposals, OHEM-hinge completeness over
positive+incomplete, class-wise smooth-L1 location regression.

proposal_type codes (reference ssn_dataset): 0 positive, 1 incomplete,
2 background.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import HEADS, LOSSES, RECOGNIZERS, BACKBONES
from ..losses.hvu_loss import ohem_hinge_loss
from ..losses.cross_entropy_loss import cross_entropy
from .base import parse_losses_localizer


def parse_stage_config(stage_cfg):
    """(reference ssn_head.parse_stage_config): int or tuple of part
    counts -> (parts tuple, total multiplier)."""
    if isinstance(stage_cfg, int):
        return (stage_cfg,), stage_cfg
    parts = tuple(stage_cfg)
    return parts, sum(parts)


def stpp_train(x, scale_factors, stpp_stage=(1, (1, 2), 1),
               num_segments_list=(2, 5, 2)):
    """Structured temporal pyramid pooling (reference
    ssn_head.STPPTrain:38-126). x: (N, num_segments, C);
    scale_factors: (N, 2). Returns (course_feat (N, C),
    stpp_feat (N, multipliers*C))."""
    s_parts, s_mult = parse_stage_config(stpp_stage[0])
    c_parts, c_mult = parse_stage_config(stpp_stage[1])
    e_parts, e_mult = parse_stage_config(stpp_stage[2])
    num_mult = s_mult + c_mult + e_mult
    x0 = num_segments_list[0]
    x1 = x0 + num_segments_list[1]

    def stage_feats(stage_feat, parts, scale):
        out = []
        stage_len = stage_feat.shape[1]
        for part in parts:
            ticks = np.arange(0, stage_len + 1e-5,
                              stage_len / part).astype(int)
            for i in range(part):
                f = stage_feat[:, ticks[i]:ticks[i + 1]].mean(axis=1) / \
                    num_mult
                if scale is not None:
                    f = f * scale[:, None]
                out.append(f)
        return out

    feats = []
    feats += stage_feats(x[:, :x0], s_parts, scale_factors[:, 0])
    feats += stage_feats(x[:, x0:x1], c_parts, None)
    feats += stage_feats(x[:, x1:], e_parts, scale_factors[:, 1])
    stpp_feat = jnp.concatenate(feats, axis=1)
    course_feat = x[:, x0:x1].mean(axis=1)
    return course_feat, stpp_feat


@HEADS.register_module()
class SSNHead(nn.Module):
    """reference ssn_head.SSNHead:280-360 (training consensus)."""
    dropout_ratio: float = 0.8
    in_channels: int = 1024
    num_classes: int = 20
    consensus: Any = None
    use_regression: bool = True
    init_std: float = 0.001
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, proposal_scale_factor, train: bool = False):
        cons = dict(self.consensus or dict(
            type='STPPTrain', stpp_stage=(1, 1, 1), num_seg=(2, 5, 2)))
        cons.pop('type', None)
        stpp_stage = cons.get('stpp_stage', (1, 1, 1))
        num_seg = cons.get('num_seg', cons.get('num_segments_list',
                                               (2, 5, 2)))
        feat_dim = x.shape[-1]
        x = x.reshape(-1, sum(num_seg), feat_dim)
        scale = proposal_scale_factor.reshape(-1, 2)
        course_feat, stpp_feat = stpp_train(x, scale, stpp_stage, num_seg)
        if self.dropout_ratio:
            course_feat = nn.Dropout(rate=self.dropout_ratio,
                                     deterministic=not train)(course_feat)
            stpp_feat = nn.Dropout(rate=self.dropout_ratio,
                                   deterministic=not train)(stpp_feat)
        init = nn.initializers.normal(self.init_std)
        activity = nn.Dense(self.num_classes + 1, kernel_init=init,
                            dtype=self.dtype, name='activity_fc')(
                                course_feat)
        completeness = nn.Dense(self.num_classes, kernel_init=init,
                                dtype=self.dtype, name='completeness_fc')(
                                    stpp_feat)
        bbox_preds = None
        if self.use_regression:
            bbox_preds = nn.Dense(self.num_classes * 2, kernel_init=init,
                                  dtype=self.dtype, name='regressor_fc')(
                                      stpp_feat)
            bbox_preds = bbox_preds.reshape(-1, self.num_classes, 2)
        return activity, completeness, bbox_preds


@LOSSES.register_module()
class SSNLoss:
    """reference ssn_loss.py — indexers are computed host-side from the
    fixed proposal-type layout so the jitted loss stays shape-static: the
    SSN sampler emits per video [positive | incomplete | background] in
    fixed counts (train_cfg.ssn.sampler)."""

    def __call__(self, activity_score, completeness_score, bbox_preds,
                 proposal_type, labels, bbox_targets, train_cfg) -> Dict:
        sampler = train_cfg['ssn']['sampler']
        lw = train_cfg['ssn']['loss_weight']
        total_ratio = (sampler['positive_ratio'] +
                       sampler['background_ratio'] +
                       sampler['incomplete_ratio'])
        per_video = sampler['num_per_video']
        pos = int(per_video * sampler['positive_ratio'] / total_ratio)
        bg = int(per_video * sampler['background_ratio'] / total_ratio)
        inc = per_video - pos - bg

        proposal_type = proposal_type.reshape(-1)
        labels = labels.reshape(-1)
        n_videos = labels.shape[0] // per_video

        # fixed layout per video: [pos | inc | bg]
        def per_video_slice(arr, start, count):
            return arr.reshape(n_videos, per_video, *arr.shape[1:])[
                :, start:start + count].reshape(
                    n_videos * count, *arr.shape[1:])

        # activity loss: positive + background proposals
        act_scores = jnp.concatenate(
            [per_video_slice(activity_score, 0, pos),
             per_video_slice(activity_score, pos + inc, bg)])
        act_labels = jnp.concatenate(
            [per_video_slice(labels, 0, pos),
             per_video_slice(labels, pos + inc, bg)])
        loss_activity = cross_entropy(act_scores, act_labels)

        # completeness loss: positive (hinge +1) + incomplete (hinge -1,
        # OHEM at ratio pos/inc)
        ohem_ratio = pos / inc
        pos_pred = per_video_slice(completeness_score, 0, pos)
        inc_pred = per_video_slice(completeness_score, pos, inc)
        pos_labels = per_video_slice(labels, 0, pos)
        inc_labels = per_video_slice(labels, pos, inc)
        positive_loss = ohem_hinge_loss(pos_pred, pos_labels, 1, 1.0, pos)
        incomplete_loss = ohem_hinge_loss(inc_pred, inc_labels, -1,
                                          ohem_ratio, inc)
        num_pos = pos_pred.shape[0]
        num_inc = int(inc_pred.shape[0] * ohem_ratio)
        loss_completeness = (positive_loss + incomplete_loss) / \
            float(num_pos + num_inc)

        losses = dict(
            loss_activity=loss_activity,
            loss_completeness=loss_completeness *
            lw['comp_loss_weight'])
        if bbox_preds is not None:
            reg_pred = per_video_slice(bbox_preds, 0, pos)
            reg_labels = per_video_slice(labels, 0, pos)
            reg_targets = per_video_slice(
                bbox_targets.reshape(-1, 2), 0, pos)
            idx = jnp.arange(reg_pred.shape[0])
            classwise = reg_pred[idx, reg_labels - 1]  # (Npos, 2)
            diff = classwise - reg_targets
            huber = jnp.where(jnp.abs(diff) < 1, 0.5 * diff ** 2,
                              jnp.abs(diff) - 0.5)
            losses['loss_reg'] = 2.0 * huber.mean() * \
                lw['reg_loss_weight']
        return losses


@RECOGNIZERS.register_module()
class SSN(nn.Module):
    """reference ssn.py:29-135 (training path)."""
    backbone: Any = None
    cls_head: Any = None
    in_channels: int = 3
    spatial_type: str = 'avg'
    dropout_ratio: float = 0.5
    loss_cls: Any = None
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
        loss_cfg = dict(self.loss_cls or dict(type='SSNLoss'))
        loss_cfg.pop('type', None)
        self._loss = SSNLoss(**loss_cfg)

    def forward_train(self, imgs, proposal_scale_factor, proposal_type,
                      proposal_labels, reg_targets, train: bool = True
                      ) -> Dict:
        # imgs: (B, num_proposals*num_segments, C, H, W) 2D frames
        frames = imgs.reshape((-1,) + imgs.shape[-3:])
        frames = jnp.transpose(frames, (0, 2, 3, 1))  # NHWC
        feat = self.backbone_m(frames, train=train)
        if isinstance(feat, (list, tuple)):
            feat = feat[-1]
        if self.spatial_type == 'avg':
            feat = feat.mean(axis=(1, 2))
        elif self.spatial_type == 'max':
            feat = feat.max(axis=(1, 2))
        activity, completeness, bbox_preds = self.cls_head_m(
            feat, proposal_scale_factor, train=train)
        losses = self._loss(activity, completeness, bbox_preds,
                            proposal_type, proposal_labels, reg_targets,
                            dict(self.train_cfg))
        losses['loss'] = sum(v for k, v in losses.items())
        return losses

    def forward_test(self, imgs, proposal_scale_factor, **kwargs):
        """Score proposals at test time. Design note: the reference's
        STPPTest re-aggregates densely-ticked features per proposal
        (reference ssn.py test path) as an efficiency trick for
        overlapping proposals; here test proposals are sampled exactly
        like training ones (SampleProposalFrames mode='val') and scored
        through the same STPP consensus — same math, simpler data
        plane. Returns (activity_scores, completeness_scores,
        bbox_preds) for SSNDataset.results_to_detections."""
        frames = imgs.reshape((-1,) + imgs.shape[-3:])
        frames = jnp.transpose(frames, (0, 2, 3, 1))
        feat = self.backbone_m(frames, train=False)
        if isinstance(feat, (list, tuple)):
            feat = feat[-1]
        if self.spatial_type == 'avg':
            feat = feat.mean(axis=(1, 2))
        elif self.spatial_type == 'max':
            feat = feat.max(axis=(1, 2))
        return self.cls_head_m(feat, proposal_scale_factor,
                               train=False)

    def __call__(self, imgs, proposal_scale_factor, return_loss=False,
                 **kwargs):
        if return_loss:
            raise NotImplementedError('use train_step')
        return self.forward_test(imgs, proposal_scale_factor, **kwargs)

    def train_step(self, batch, train: bool = True):
        losses = self.forward_train(
            batch['imgs'], batch['proposal_scale_factor'],
            batch['proposal_type'], batch['proposal_labels'],
            batch['reg_targets'], train=train)
        return parse_losses_localizer(losses)
