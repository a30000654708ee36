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


class TestBBoxAssignSample:
    """Host-side assigner/sampler/targets (reference
    max_iou_assigner_ava.py, mmdet RandomSampler, bbox_target.py)."""

    def _gts(self):
        gt_bboxes = np.array([[0., 0., 10., 10.],
                              [20., 20., 30., 30.]], np.float32)
        gt_labels = np.zeros((2, 5), np.float32)
        gt_labels[0, 1] = 1
        gt_labels[1, 2] = 1
        gt_labels[1, 3] = 1
        return gt_bboxes, gt_labels

    def test_assigner_codes(self):
        from mscl_tpu.core import MaxIoUAssignerAVA
        gt_bboxes, gt_labels = self._gts()
        proposals = np.array([
            [0., 0., 10., 10.],     # IoU 1.0 with gt0 -> pos
            [0., 0., 20., 20.],     # IoU 0.25 with gt0 -> don't care
            [21., 21., 31., 31.],   # IoU ~0.68 with gt1 -> don't care
            [50., 50., 60., 60.],   # IoU 0 -> neg
        ], np.float32)
        a = MaxIoUAssignerAVA(pos_iou_thr=0.9, neg_iou_thr=0.2,
                              min_pos_iou=0.9, match_low_quality=False)
        res = a.assign(proposals, gt_bboxes, gt_labels)
        np.testing.assert_array_equal(res['gt_inds'], [1, -1, -1, 0])
        # multilabel row copied from the assigned gt
        np.testing.assert_array_equal(res['labels'][0], gt_labels[0])
        assert res['labels'][3].sum() == 0

    def test_assigner_low_quality_match(self):
        from mscl_tpu.core import MaxIoUAssignerAVA
        gt_bboxes, gt_labels = self._gts()
        # best proposal for gt1 has IoU ~0.68 < pos_thr but >= min_pos_iou
        proposals = np.array([[21., 21., 31., 31.]], np.float32)
        a = MaxIoUAssignerAVA(pos_iou_thr=0.9, neg_iou_thr=0.2,
                              min_pos_iou=0.5, match_low_quality=True)
        res = a.assign(proposals, gt_bboxes, gt_labels)
        assert res['gt_inds'][0] == 2
        np.testing.assert_array_equal(res['labels'][0], gt_labels[1])

    def test_assigner_no_gt(self):
        from mscl_tpu.core import MaxIoUAssignerAVA
        a = MaxIoUAssignerAVA(pos_iou_thr=0.9, neg_iou_thr=0.9)
        res = a.assign(np.zeros((3, 4), np.float32),
                       np.zeros((0, 4), np.float32),
                       np.zeros((0, 5), np.float32))
        np.testing.assert_array_equal(res['gt_inds'], [0, 0, 0])

    def test_sampler_and_targets(self):
        from mscl_tpu.core import assign_and_sample
        gt_bboxes, gt_labels = self._gts()
        rng = np.random.default_rng(0)
        proposals = np.concatenate(
            [gt_bboxes + rng.uniform(-0.2, 0.2, (2, 4)).astype(np.float32),
             rng.uniform(40, 90, (20, 4)).astype(np.float32)])
        proposals[:, 2:] = np.maximum(proposals[:, 2:],
                                      proposals[:, :2] + 1)
        rcnn = dict(
            assigner=dict(type='MaxIoUAssignerAVA', pos_iou_thr=0.9,
                          neg_iou_thr=0.9, min_pos_iou=0.9),
            sampler=dict(type='RandomSampler', num=8, pos_fraction=1,
                         neg_pos_ub=-1, add_gt_as_proposals=True),
            pos_weight=1.0)
        out = assign_and_sample(proposals, gt_bboxes, gt_labels, rcnn,
                                np.random.default_rng(1))
        assert out['rois'].shape == (8, 4)
        assert out['roi_labels'].shape == (8, 5)
        assert out['roi_weights'].shape == (8,)
        # gts added as self-assigned positives: first rows carry labels
        n_pos = int((out['roi_labels'].sum(1) > 0).sum())
        assert n_pos >= 2
        # weights: >0 on sampled rows, 0 on padding
        n_valid = int((out['roi_weights'] > 0).sum())
        assert n_pos <= n_valid <= 8

    def test_train_loss_decreases(self):
        """End-to-end AVA training: pipeline-assigned targets through the
        jitted train step; detector loss decreases (VERDICT round-1 item
        4 'done' criterion)."""
        from mscl_tpu.core import (assign_and_sample, build_lr_schedule,
                                   build_optimizer, init_state,
                                   make_train_step)
        model = RECOGNIZERS.get('AVAFastRCNN')(
            backbone=dict(type='resnet_flow.r2d_18'),
            roi_head=dict(
                bbox_roi_extractor=dict(type='SingleRoIExtractor3D',
                                        featmap_stride=16, output_size=4),
                bbox_head=dict(type='BBoxHeadAVA', in_channels=128,
                               num_classes=5, topk=(3,))))
        rng = np.random.default_rng(0)
        B, R, C = 2, 8, 5
        rcnn = dict(
            assigner=dict(type='MaxIoUAssignerAVA', pos_iou_thr=0.7,
                          neg_iou_thr=0.3, min_pos_iou=0.3),
            sampler=dict(type='RandomSampler', num=R, pos_fraction=0.5,
                         neg_pos_ub=-1, add_gt_as_proposals=True),
            pos_weight=1.0)
        gt_bboxes = np.array([[4., 4., 28., 28.],
                              [32., 32., 60., 60.]], np.float32)
        gt_labels = np.zeros((2, C), np.float32)
        gt_labels[0, 1] = 1
        gt_labels[1, 3] = 1
        rois, labels, weights = [], [], []
        for _ in range(B):
            proposals = np.concatenate(
                [gt_bboxes + rng.uniform(-2, 2, (2, 4)).astype(np.float32),
                 rng.uniform(0, 64, (12, 2)).astype(np.float32).repeat(
                     2, axis=1) + np.array([0, 0, 8, 8], np.float32)])
            out = assign_and_sample(proposals, gt_bboxes, gt_labels,
                                    rcnn, rng)
            rois.append(out['rois'])
            labels.append(out['roi_labels'])
            weights.append(out['roi_weights'])
        batch = dict(
            imgs=rng.random((B, 1, 3, 4, 64, 64)).astype(np.float32),
            rois=np.stack(rois), roi_labels=np.stack(labels),
            roi_weights=np.stack(weights))
        lr = build_lr_schedule(dict(policy='fixed'), 0.05, 1, 1)
        tx = build_optimizer(dict(type='SGD', lr=0.05, momentum=0.9), lr,
                             grad_clip=dict(max_norm=40))
        state = init_state(model, tx, batch)
        step = jax.jit(make_train_step(model, tx))
        losses = []
        for _ in range(8):
            state, log_vars = step(state, batch)
            losses.append(float(log_vars['loss_action_cls']))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0] * 0.8, losses

    def test_assign_sample_pipeline_transform(self):
        from mscl_tpu.datasets.ava_dataset import AVAAssignSample
        gt_bboxes, gt_labels = self._gts()
        t = AVAAssignSample(rcnn=dict(
            assigner=dict(type='MaxIoUAssignerAVA', pos_iou_thr=0.9,
                          neg_iou_thr=0.9, min_pos_iou=0.9),
            sampler=dict(type='RandomSampler', num=4, pos_fraction=1,
                         neg_pos_ub=-1, add_gt_as_proposals=True),
            pos_weight=1.0), seed=0)
        results = t(dict(gt_bboxes=gt_bboxes, gt_labels=gt_labels,
                         proposals=np.zeros((0, 4), np.float32)))
        assert results['rois'].shape == (4, 4)
        assert results['roi_labels'].shape == (4, 5)


class TestLFBStack:
    """Long-term feature bank: infer-head collection -> pkl -> LFB
    sampling -> FBOHead fusion -> ACRNHead (reference fbo_head.py,
    lfb_infer_head.py, misc_head.py, common/lfb.py)."""

    def test_infer_save_sample_fuse(self, tmp_path):
        from mscl_tpu.models.heads import (ACRNHead, FBOHead, LFB,
                                           LFBInferHead, sample_lfb)
        rng = np.random.default_rng(0)
        C = 16
        infer = LFBInferHead(str(tmp_path), dataset_mode='train',
                             use_half_precision=False)
        # two keyframes, 2 RoIs each
        metas = [dict(img_key='vidA,0902'), dict(img_key='vidA,0903')]
        x = rng.random((4, 2, 3, 3, C)).astype(np.float32)
        rois = np.array([[0, 0, 0, 4, 4], [0, 1, 1, 5, 5],
                         [1, 0, 0, 4, 4], [1, 2, 2, 6, 6]], np.float32)
        out = infer(x, rois, metas)
        np.testing.assert_array_equal(out, x)  # passthrough
        path = infer.save()

        lfb = LFB(str(tmp_path), max_num_sampled_feat=2, window_size=4,
                  lfb_channels=C, dataset_modes=('train',))
        assert len(lfb) == 1
        lt = lfb['vidA,0902']
        assert lt.shape == (8, C)
        # both stored features of second 902 appear in its window slots
        assert np.abs(lt).sum() > 0

        lt_batch = sample_lfb(lfb, ['vidA,0902', 'vidA,0903'],
                              rng=np.random.default_rng(0))
        assert lt_batch.shape == (2, 8, C)

        head = FBOHead(fbo_cfg=dict(type='non_local',
                                    st_feat_channels=C,
                                    lt_feat_channels=C,
                                    latent_channels=8))
        roi_feat = jnp.asarray(rng.random((2, 2, 3, 3, C)),
                               jnp.float32)
        v = head.init({'params': jax.random.PRNGKey(0)},
                      roi_feat, jnp.asarray(lt_batch))
        fused = head.apply(v, roi_feat, jnp.asarray(lt_batch))
        # identity (C) + non-local output (latent_channels), matching
        # the reference where fbo_feat stays in latent space
        assert fused.shape == (2, C + 8)

        # avg/max FBO variants are parameter-free paths
        for mode in ('avg', 'max'):
            h2 = FBOHead(fbo_cfg=dict(type=mode))
            v2 = h2.init({'params': jax.random.PRNGKey(0)}, roi_feat,
                         jnp.asarray(lt_batch))
            assert h2.apply(v2, roi_feat,
                            jnp.asarray(lt_batch)).shape == (2, 2 * C)

        acrn = ACRNHead(in_channels=2 * C, out_channels=C)
        ctx = jnp.asarray(rng.random((2, 2, 6, 6, C)), jnp.float32)
        va = acrn.init({'params': jax.random.PRNGKey(0)}, roi_feat,
                       ctx, jnp.asarray(rois[:2]))
        y, _ = acrn.apply(va, roi_feat, ctx, jnp.asarray(rois[:2]),
                          train=True, mutable=['batch_stats'])
        assert y.shape == (2, 2, 6, 6, C)


class TestSharedHeads:
    """AVAFastRCNN shared_head wiring: ACRN (actor-context relation)
    and FBO (feature-bank operator) between RoI extraction and the
    bbox head (reference roi_head shared_head configs)."""

    def _run(self, shared_head, in_channels):
        import jax
        from mscl_tpu.models.builder import build_model
        model = build_model(dict(
            type='AVAFastRCNN',
            backbone=dict(type='ResNet3dSlowOnly', depth=18,
                          pretrained=None, base_channels=8),
            roi_head=dict(
                bbox_roi_extractor=dict(type='SingleRoIExtractor3D',
                                        featmap_stride=16,
                                        output_size=4,
                                        with_temporal_pool=True),
                shared_head=shared_head,
                bbox_head=dict(type='BBoxHeadAVA',
                               in_channels=in_channels,
                               num_classes=6))))
        imgs = jnp.zeros((1, 3, 4, 32, 32))
        rois = jnp.asarray([[0., 0., 0., 16., 16.],
                            [0., 4., 4., 28., 28.]])
        v = model.init(jax.random.PRNGKey(0), imgs, rois,
                       return_loss=False)
        scores = model.apply(v, imgs, rois, return_loss=False,
                             mutable=['batch_stats'])[0]
        assert scores.shape == (2, 6)
        assert bool(jnp.all((scores >= 0) & (scores <= 1)))

    def test_acrn_shared_head(self):
        self._run(dict(type='ACRNHead', in_channels=128,
                       out_channels=64), 64)

    def test_fbo_shared_head(self):
        self._run(dict(type='FBOHead',
                       lfb_cfg=dict(lfb_prefix_path='/tmp/x'),
                       fbo_cfg=dict(type='max')), 128)
