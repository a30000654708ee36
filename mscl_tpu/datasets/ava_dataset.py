"""AVADataset — spatio-temporal action detection annotations.

Parity: reference mmaction/datasets/ava_dataset.py:94-425 — csv records
(video_id, timestamp, x1, y1, x2, y2, action_id, person_id) grouped per
keyframe, multilabel one-hot per box, person-detector proposals filtered
by score threshold, exclude-file filtering, and frame-level detection mAP
@IoU 0.5 evaluation (compact reimplementation of the ava_evaluation
pascal protocol in localization/det_eval.py).
"""
from __future__ import annotations

import csv
import os.path as osp
import pickle
from collections import defaultdict

import numpy as np

from .base import BaseDataset
from .builder import DATASETS, PIPELINES
from .pipelines.loading import SampleFrames


@PIPELINES.register_module()
class SampleAVAFrames(SampleFrames):
    """Sample a clip centered on the annotation timestamp
    (reference loading.py:425-460)."""

    def __init__(self, clip_len, frame_interval=2, test_mode=False):
        super().__init__(clip_len, frame_interval, test_mode=test_mode)

    def __call__(self, results):
        fps = results['fps']
        timestamp = results['timestamp']
        timestamp_start = results['timestamp_start']
        shot_info = results['shot_info']
        center_index = fps * (timestamp - timestamp_start) + 1
        start = center_index - (self.clip_len // 2) * self.frame_interval
        end = center_index + ((self.clip_len + 1) // 2) * \
            self.frame_interval
        frame_inds = np.arange(start, end, self.frame_interval)
        if not self.test_mode:
            skip = np.random.randint(-(self.frame_interval // 2),
                                     (self.frame_interval + 1) // 2,
                                     size=self.clip_len)
            frame_inds = frame_inds + skip
        frame_inds = np.clip(frame_inds, shot_info[0], shot_info[1] - 1)
        results['frame_inds'] = frame_inds.astype(np.int64)
        results['clip_len'] = self.clip_len
        results['frame_interval'] = self.frame_interval
        results['num_clips'] = 1
        results['crop_quadruple'] = np.array([0, 0, 1, 1],
                                             dtype=np.float32)
        return results


@PIPELINES.register_module()
class AVAAssignSample:
    """Assign proposals to gts, sample a fixed RoI budget, and emit
    padded training targets (rois/roi_labels/roi_weights).

    TPU-native equivalent of the reference's in-forward mmdet
    assigner+sampler (reference models/heads/roi_head.py
    _bbox_forward_train + core/bbox/): runs host-side in the pipeline so
    the jitted step consumes static-shape RoI batches. ``rcnn`` takes the
    reference train_cfg.rcnn dict verbatim (assigner/sampler/pos_weight).
    """

    def __init__(self, rcnn, seed=None):
        self.rcnn = rcnn
        self.seed = seed

    def __call__(self, results):
        from ..core.bbox import assign_and_sample  # noqa: local import
        gt_bboxes = np.asarray(results['gt_bboxes'], np.float32)
        gt_labels = np.asarray(results['gt_labels'], np.float32)
        proposals = np.asarray(
            results.get('proposals', np.zeros((0, 4), np.float32)),
            np.float32)
        rng = np.random.default_rng(self.seed) if self.seed is not None \
            else None
        out = assign_and_sample(proposals, gt_bboxes, gt_labels,
                                self.rcnn, rng)
        results.update(out)
        return results


@DATASETS.register_module()
class AVADataset(BaseDataset):

    def __init__(self, ann_file, pipeline, exclude_file=None,
                 label_file=None, data_prefix=None, test_mode=False,
                 proposal_file=None, person_det_score_thr=0.9,
                 num_classes=81, filename_tmpl='img_{:05}.jpg',
                 num_max_proposals=1000, timestamp_start=900,
                 timestamp_end=1800, fps=30, custom_classes=None,
                 **kwargs):
        self.exclude_file = exclude_file
        self.label_file = label_file
        self.proposal_file = proposal_file
        self.person_det_score_thr = person_det_score_thr
        self._num_classes = num_classes
        self.filename_tmpl = filename_tmpl
        self.num_max_proposals = num_max_proposals
        self.timestamp_start = timestamp_start
        self.timestamp_end = timestamp_end
        self.fps = fps
        self.custom_classes = custom_classes
        super().__init__(ann_file, pipeline, data_prefix, test_mode,
                         num_classes=num_classes, start_index=1,
                         modality='RGB')
        self.proposals = None
        if proposal_file is not None:
            with open(proposal_file, 'rb') as f:
                self.proposals = pickle.load(f)
        if exclude_file is not None:
            excluded = set()
            with open(exclude_file) as f:
                for line in f:
                    vid, ts = line.strip().split(',')[:2]
                    excluded.add((vid, int(float(ts))))
            self.video_infos = [
                v for v in self.video_infos
                if (v['video_id'], v['timestamp']) not in excluded]

    def load_annotations(self):
        records = defaultdict(lambda: defaultdict(set))
        with open(self.ann_file) as f:
            for row in csv.reader(f):
                if not row:
                    continue
                vid = row[0]
                ts = int(float(row[1]))
                box = tuple(float(x) for x in row[2:6])
                label = int(row[6])
                if self.custom_classes is not None and \
                        label not in self.custom_classes:
                    continue
                records[(vid, ts)][box].add(label)
        video_infos = []
        for (vid, ts), boxes in sorted(records.items()):
            gt_bboxes, gt_labels = [], []
            for box, labels in boxes.items():
                gt_bboxes.append(box)
                onehot = np.zeros(self._num_classes, np.float32)
                for lb in labels:
                    if 0 <= lb < self._num_classes:
                        onehot[lb] = 1.0
                gt_labels.append(onehot)
            frame_dir = vid
            if self.data_prefix is not None:
                frame_dir = osp.join(self.data_prefix, vid)
            video_infos.append(dict(
                video_id=vid, timestamp=ts, frame_dir=frame_dir,
                fps=self.fps, timestamp_start=self.timestamp_start,
                timestamp_end=self.timestamp_end,
                shot_info=(0, (self.timestamp_end - self.timestamp_start)
                           * self.fps),
                gt_bboxes=np.array(gt_bboxes, np.float32),
                gt_labels=np.stack(gt_labels),
                label=0))
        return video_infos

    def _prepare(self, idx):
        import copy
        results = copy.deepcopy(self.video_infos[idx])
        results['filename_tmpl'] = self.filename_tmpl
        results['modality'] = self.modality
        results['start_index'] = self.start_index
        key = f"{results['video_id']},{results['timestamp']:04d}"
        if self.proposals is not None and key in self.proposals:
            props = np.asarray(self.proposals[key], np.float32)
            if props.shape[-1] == 5:
                keep = props[:, 4] >= min(self.person_det_score_thr,
                                          props[:, 4].max())
                props = props[keep][:, :4]
            results['proposals'] = props[:self.num_max_proposals]
        return self.pipeline(results)

    prepare_train_frames = _prepare
    prepare_test_frames = _prepare

    def evaluate(self, results, metrics=('mAP',), **kwargs):
        """results: list of dicts {video_id, timestamp, bboxes (N, 4)
        normalized, scores (N, C)}. Detection mAP@IoU0.5 per action
        class (compact pascal protocol)."""
        from ..localization.det_eval import frame_map
        gts, dets = [], []
        for info, res in zip(self.video_infos, results):
            gts.append(dict(bboxes=info['gt_bboxes'],
                            labels=info['gt_labels']))
            dets.append(res)
        return {'mAP@0.5IOU': frame_map(dets, gts,
                                        num_classes=self._num_classes)}


# Alias: reference configs say type='RedisAVADataset' (reference
# datasets/redis_ava_dataset.py:20 — AVA annotations served from redis);
# the TPU-native data plane reads the same csv/pkl files from the
# filesystem, so the alias shares the implementation.
DATASETS.register_module(name='RedisAVADataset', module=AVADataset)
