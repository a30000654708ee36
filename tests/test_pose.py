"""Skeleton (PoseC3D-style) data path: UniformSampleFrames,
PoseDecode, GeneratePoseTarget heatmaps, end-to-end recognizer."""
import pickle

import jax
import numpy as np
import pytest

from mscl_tpu.datasets import PoseDataset, default_collate
from mscl_tpu.datasets.pipelines import (GeneratePoseTarget, PoseDecode,
                                         UniformSampleFrames)
from mscl_tpu.models import RECOGNIZERS


@pytest.fixture(scope='module')
def pose_pkl(tmp_path_factory):
    root = tmp_path_factory.mktemp('pose')
    rng = np.random.default_rng(0)
    annos = []
    for v in range(8):
        annos.append(dict(
            frame_dir=f'v{v}', total_frames=30, label=v % 2,
            img_shape=(32, 32),
            keypoint=rng.uniform(4, 28, (2, 30, 17, 2)).astype(
                np.float32),
            keypoint_score=rng.uniform(0.5, 1, (2, 30, 17)).astype(
                np.float32)))
    path = root / 'pose.pkl'
    path.write_bytes(pickle.dumps(annos))
    return str(path)


class TestUniformSampleFrames:

    def test_regimes(self):
        t = UniformSampleFrames(clip_len=8)
        for total in (5, 12, 100):   # <clip, <2clip, >=2clip
            np.random.seed(0)
            out = t(dict(total_frames=total, start_index=0))
            assert out['frame_inds'].shape == (8,)
            assert out['frame_inds'].max() < total
        # >=2clip regime: one index per equal segment, strictly sorted
        np.random.seed(0)
        out = t(dict(total_frames=100, start_index=0))
        inds = out['frame_inds']
        assert (np.diff(inds) > 0).all()
        assert all(i * 100 // 8 <= inds[i] < (i + 1) * 100 // 8 + 13
                   for i in range(8))

    def test_test_mode_deterministic(self):
        t = UniformSampleFrames(clip_len=8, num_clips=2, test_mode=True)
        a = t(dict(total_frames=50, start_index=0))['frame_inds']
        b = t(dict(total_frames=50, start_index=0))['frame_inds']
        np.testing.assert_array_equal(a, b)
        assert a.shape == (16,)


class TestGeneratePoseTarget:

    def test_kp_heatmap_peaks_at_joint(self):
        kp = np.zeros((1, 1, 17, 2), np.float32)
        kp[0, 0, 0] = (10, 6)
        results = dict(keypoint=kp,
                       keypoint_score=np.ones((1, 1, 17), np.float32),
                       img_shape=(16, 24))
        out = GeneratePoseTarget(sigma=1.0)(results)
        hm = out['imgs'][0, :, :, 0]
        assert np.unravel_index(hm.argmax(), hm.shape) == (6, 10)
        assert hm.max() == pytest.approx(1.0, abs=1e-4)
        # score scales the peak
        results['keypoint_score'] *= 0.5
        out2 = GeneratePoseTarget(sigma=1.0)(results)
        assert out2['imgs'][0, :, :, 0].max() == pytest.approx(
            0.5, abs=1e-4)

    def test_limb_heatmap_covers_segment(self):
        kp = np.zeros((1, 1, 17, 2), np.float32)
        kp[0, 0, 0] = (4, 8)
        kp[0, 0, 1] = (20, 8)    # limb (0, 1) horizontal
        results = dict(keypoint=kp,
                       keypoint_score=np.ones((1, 1, 17), np.float32),
                       img_shape=(16, 24))
        out = GeneratePoseTarget(sigma=1.0, with_kp=False,
                                 with_limb=True)(results)
        limb0 = out['imgs'][0, :, :, 0]   # skeleton[0] = (0, 1)
        # every point along the segment is ~1
        assert limb0[8, 4:21].min() > 0.99
        # far away is ~0
        assert limb0[0, 0] < 1e-3


class TestPoseC3DEndToEnd:

    def test_train_step(self, pose_pkl):
        pipeline = [
            dict(type='UniformSampleFrames', clip_len=8, num_clips=1),
            dict(type='PoseDecode'),
            dict(type='GeneratePoseTarget', sigma=0.6),
            dict(type='FormatShape', input_format='NCTHW_Heatmap'),
            dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
            dict(type='ToTensor', keys=['imgs', 'label']),
        ]
        ds = PoseDataset(pose_pkl, pipeline)
        np.random.seed(0)
        batch = default_collate([ds[i] for i in range(2)])
        assert batch['imgs'].shape == (2, 1, 17, 8, 32, 32)
        # PoseC3D recipe: SlowOnly over 17-channel heatmap volumes
        model = RECOGNIZERS.get('Recognizer3D')(
            backbone=dict(type='ResNet3dSlowOnly', depth=50,
                          pretrained=None, in_channels=17,
                          base_channels=16, conv1_kernel=(1, 7, 7),
                          conv1_stride_t=1, pool1_stride_t=1,
                          with_pool1=False, inflate=(0, 1, 1),
                          num_stages=3, out_indices=(2,),
                          spatial_strides=(2, 2, 2),
                          temporal_strides=(1, 1, 2)),
            cls_head=dict(type='I3DHead', num_classes=2,
                          in_channels=256, spatial_type='avg',
                          dropout_ratio=0.0),
            test_cfg=dict(average_clips='prob'))
        from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                                   init_state, make_train_step)
        lr = build_lr_schedule(dict(policy='fixed'), 0.01, 1, 1)
        tx = build_optimizer(dict(type='SGD', lr=0.01, momentum=0.9), lr)
        state = init_state(model, tx, batch)
        step = jax.jit(make_train_step(model, tx))
        state, log_vars = step(state, batch)
        assert np.isfinite(float(log_vars['loss']))
