"""AVA detection stack tests: RoIAlign math, extractor shapes, focal
multilabel head, end-to-end train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscl_tpu.models import RECOGNIZERS
from mscl_tpu.ops import roi_align


class TestRoIAlign:

    def test_constant_image(self):
        img = jnp.full((1, 16, 16, 2), 3.0)
        rois = jnp.asarray([[0, 2.0, 2.0, 10.0, 10.0]])
        out = roi_align(img, rois, output_size=4)
        assert out.shape == (1, 4, 4, 2)
        np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-6)

    def test_gradient_image_means(self):
        """RoI over a linear-in-x image: bin means increase linearly."""
        xs = jnp.arange(16, dtype=jnp.float32)
        img = jnp.broadcast_to(xs[None, None, :, None], (1, 16, 16, 1))
        rois = jnp.asarray([[0, 0.0, 0.0, 16.0, 16.0]])
        out = np.asarray(roi_align(img, rois, output_size=4,
                                   sampling_ratio=2))[0, 0, :, 0]
        diffs = np.diff(out)
        assert np.allclose(diffs, diffs[0], atol=1e-4)  # linear
        assert out[0] < out[-1]

    def test_batch_index_routing(self):
        img = jnp.stack([jnp.zeros((8, 8, 1)), jnp.ones((8, 8, 1))])
        rois = jnp.asarray([[0, 1.0, 1.0, 7.0, 7.0],
                            [1, 1.0, 1.0, 7.0, 7.0]])
        out = np.asarray(roi_align(img, rois, output_size=2))
        assert np.allclose(out[0], 0.0)
        assert np.allclose(out[1], 1.0)


class TestAVAFastRCNN:

    def test_train_step_and_inference(self):
        model = RECOGNIZERS.get('AVAFastRCNN')(
            backbone=dict(type='ResNet3dSlowOnly', depth=50,
                          pretrained=None, lateral=False),
            roi_head=dict(
                bbox_roi_extractor=dict(type='SingleRoIExtractor3D',
                                        featmap_stride=16, output_size=4),
                bbox_head=dict(type='BBoxHeadAVA', in_channels=2048,
                               num_classes=11, topk=(3,))))
        rng = np.random.default_rng(0)
        B, R = 2, 6
        batch = dict(
            imgs=rng.random((B, 1, 3, 4, 64, 64)).astype(np.float32),
            rois=np.concatenate(
                [rng.integers(0, B, (R, 1)),
                 rng.uniform(0, 32, (R, 2)),
                 rng.uniform(32, 64, (R, 2))], axis=1).astype(np.float32),
            labels=(rng.random((R, 11)) > 0.7).astype(np.float32))
        from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                                   init_state, make_train_step)
        lr = build_lr_schedule(dict(policy='fixed'), 0.01, 1, 1)
        tx = build_optimizer(dict(type='SGD', lr=0.01, momentum=0.9), lr)
        state = init_state(model, tx, batch)
        step = jax.jit(make_train_step(model, tx))
        state, log_vars = step(state, batch)
        assert np.isfinite(float(log_vars['loss_action_cls']))
        assert 'recall@thr=0.5' in log_vars and 'recall@top3' in log_vars
        scores = model.apply(
            {'params': state.params, 'batch_stats': state.batch_stats},
            jnp.asarray(batch['imgs']), jnp.asarray(batch['rois']),
            return_loss=False)
        assert scores.shape == (R, 11)
        assert float(scores.min()) >= 0 and float(scores.max()) <= 1


class TestAVADataset:

    def test_csv_parsing_and_map(self, tmp_path):
        from mscl_tpu.datasets import AVADataset
        from mscl_tpu.localization import frame_map
        csv_path = tmp_path / 'ava.csv'
        csv_path.write_text(
            'vidA,902,0.1,0.1,0.5,0.5,3,0\n'
            'vidA,902,0.1,0.1,0.5,0.5,5,0\n'
            'vidA,903,0.2,0.2,0.6,0.6,3,1\n')
        ds = AVADataset(str(csv_path), pipeline=[], num_classes=8,
                        data_prefix=str(tmp_path))
        assert len(ds) == 2
        info = ds.video_infos[0]
        # same box with two actions collapses to one multilabel record
        assert info['gt_bboxes'].shape == (1, 4)
        assert info['gt_labels'][0][3] == 1
        assert info['gt_labels'][0][5] == 1

        gts = [dict(bboxes=info['gt_bboxes'], labels=info['gt_labels'])]
        scores = np.zeros((1, 8))
        scores[0, 3] = 0.9
        scores[0, 5] = 0.8
        dets = [dict(bboxes=info['gt_bboxes'], scores=scores)]
        assert frame_map(dets, gts, num_classes=8) == pytest.approx(1.0)

    def test_map_penalizes_misses(self):
        from mscl_tpu.localization import frame_map
        gt_boxes = np.array([[0.1, 0.1, 0.5, 0.5],
                             [0.6, 0.6, 0.9, 0.9]], np.float32)
        labels = np.zeros((2, 4), np.float32)
        labels[:, 2] = 1
        gts = [dict(bboxes=gt_boxes, labels=labels)]
        # detect only the first box
        scores = np.zeros((1, 4))
        scores[0, 2] = 0.9
        dets = [dict(bboxes=gt_boxes[:1], scores=scores)]
        m = frame_map(dets, gts, num_classes=4)
        assert m == pytest.approx(0.5)

    def test_sample_ava_frames(self):
        from mscl_tpu.datasets import SampleAVAFrames
        t = SampleAVAFrames(clip_len=4, frame_interval=2, test_mode=True)
        results = dict(fps=30, timestamp=902, timestamp_start=900,
                       shot_info=(0, 27000))
        out = t(results)
        assert len(out['frame_inds']) == 4
        # centered on frame 30*(902-900)+1 = 61
        assert out['frame_inds'][out['frame_inds'].shape[0] // 2] in (
            61, 63)
