"""BMN localizer + proposal utils tests."""
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

from mscl_tpu.localization import (average_recall_at_avg_proposals,
                                   soft_nms, temporal_iop, temporal_iou)
from mscl_tpu.models import RECOGNIZERS


class TestProposalUtils:

    def test_temporal_iou(self):
        iou = temporal_iou(np.array([0.0]), np.array([1.0]), 0.5, 1.5)
        np.testing.assert_allclose(iou, [1 / 3])
        assert temporal_iou(np.array([0.0]), np.array([1.0]), 2.0, 3.0)[0] == 0

    def test_temporal_iop(self):
        iop = temporal_iop(0.0, 1.0, np.array([0.5]), np.array([2.0]))
        np.testing.assert_allclose(iop, [0.5])

    def test_soft_nms_keeps_best(self):
        props = np.array([
            [0.0, 0.5, 0.9],
            [0.01, 0.52, 0.8],   # heavy overlap with the first
            [0.6, 0.9, 0.7],
        ])
        out = soft_nms(props, alpha=0.4, low_threshold=0.0,
                       high_threshold=0.0, top_k=10)
        assert out[0][2] == 0.9          # best kept with full score
        assert out.shape[1] == 3

    def test_ar_at_an(self):
        gt = {'v1': np.array([[0.0, 1.0]])}
        props = {'v1': np.array([[0.0, 1.0, 0.9], [2.0, 3.0, 0.1]])}
        recall, avg_recall, ppv, auc = average_recall_at_avg_proposals(
            gt, props, total_num_proposals=2)
        assert avg_recall[-1] == 1.0
        assert 0 < auc <= 100


class TestBMN:

    def test_train_step_and_proposals(self):
        bmn = RECOGNIZERS.get('BMN')(
            temporal_dim=16, feat_dim=24, num_samples=8,
            num_samples_per_bin=2, hidden_dim_1d=16, hidden_dim_2d=8,
            hidden_dim_3d=16)
        feat = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 16, 24)).astype(np.float32))
        gt = [np.array([[0.1, 0.4]]), np.array([[0.3, 0.8]])]
        conf, start, end = bmn.generate_labels(gt)
        assert conf.shape == (2, 16, 16)
        assert start.shape == (2, 16)
        batch = dict(raw_feature=feat,
                     label_confidence=jnp.asarray(conf),
                     label_start=jnp.asarray(start),
                     label_end=jnp.asarray(end))
        rngs = {'params': jax.random.PRNGKey(0),
                'moco': jax.random.PRNGKey(1),
                'dropout': jax.random.PRNGKey(2)}
        v = bmn.init(rngs, batch, method='train_step')
        (loss, log_vars), _ = bmn.apply(
            v, batch, method='train_step', mutable=['batch_stats'],
            rngs={'moco': jax.random.PRNGKey(3)})
        assert np.isfinite(float(loss))
        for k in ('loss_tem', 'loss_pem_reg', 'loss_pem_cls'):
            assert k in log_vars
        cm, s, e = bmn.apply(v, feat, method='forward_test')
        props = bmn.proposals_from_outputs(
            cm[0], s[0], e[0],
            dict(duration_frame=256, duration_second=8.0,
                 video_name='v_x'))
        assert len(props) > 0
        assert all(0 <= p['segment'][0] <= p['segment'][1] <= 8.0
                   for p in props)

    def test_label_generation_math(self):
        """gt exactly on an anchor row: iou map peaks at the right cell."""
        bmn = RECOGNIZERS.get('BMN')(temporal_dim=10, feat_dim=8)
        gt = [np.array([[0.2, 0.5]])]
        conf, start, end = bmn.generate_labels(gt)
        # match map: row = duration index, col = start index
        # start 0.2 -> index 2; duration 0.3 -> 3 steps -> row 2
        assert conf[0].argmax() == conf[0].reshape(-1).argmax()
        d, s = np.unravel_index(conf[0].argmax(), conf[0].shape)
        assert s == 2 and d == 2
        # gt start 0.2 padded +-0.15: anchors [0.1,0.2] and [0.2,0.3] both
        # have IoP 1 (tie); same for the end at 0.5
        assert start[0][1] == start[0][2] == 1.0
        assert end[0][4] == end[0][5] == 1.0
        assert start[0][6:].max() == 0.0


class TestSSNDataPath:
    """SSNDataset end to end: proposal file -> pools -> video-centric
    sampling -> SampleProposalFrames -> frames -> jitted SSN train step
    (VERDICT round-1 item 5 'done' criterion)."""

    @pytest.fixture(scope='class')
    def ssn_root(self, tmp_path_factory):
        import cv2
        root = tmp_path_factory.mktemp('ssn')
        rng = np.random.default_rng(0)
        lines = []
        for v in range(2):
            vdir = root / f'video_{v}'
            vdir.mkdir()
            for i in range(1, 121):
                cv2.imwrite(str(vdir / f'img_{i:05d}.jpg'),
                            rng.integers(0, 256, (20, 20, 3),
                                         dtype=np.uint8))
            lines += [
                f'# {v}', f'video_{v}', '120', '1',
                '1', '2 30 60',
                '4',
                '2 0.80 0.90 28 62',   # positive (best_iou > 0.7)
                '2 0.20 0.80 40 55',   # incomplete (iou<0.3, ovl>0.01)
                '0 0.00 0.00 80 110',  # background (iou<0.01, cov>0.02)
                '2 0.75 0.92 32 58',   # positive
            ]
        ann = root / 'proposal_list.txt'
        ann.write_text('\n'.join(lines) + '\n')
        return dict(root=str(root), ann=str(ann))

    def _cfgs(self):
        train_cfg = dict(ssn=dict(
            assigner=dict(positive_iou_threshold=0.7,
                          background_iou_threshold=0.01,
                          incomplete_iou_threshold=0.3,
                          background_coverage_threshold=0.02,
                          incomplete_overlap_threshold=0.01),
            sampler=dict(num_per_video=8, positive_ratio=1,
                         background_ratio=1, incomplete_ratio=6,
                         add_gt_as_proposals=True),
            loss_weight=dict(comp_loss_weight=0.1, reg_loss_weight=0.1)))
        test_cfg = dict(ssn=dict(
            sampler=dict(test_interval=6, batch_size=16),
            evaluater=dict(top_k=2000, nms=0.2)))
        return train_cfg, test_cfg

    def test_pools_and_sampling(self, ssn_root):
        from mscl_tpu.datasets import SSNDataset
        train_cfg, test_cfg = self._cfgs()
        ds = SSNDataset(ssn_root['ann'], pipeline=[],
                        train_cfg=train_cfg, test_cfg=test_cfg,
                        data_prefix=ssn_root['root'])
        # 2 videos x (2 positives + 1 gt) / 1 incomplete / 1 background
        assert len(ds.positive_pool) == 6
        assert len(ds.incomplete_pool) == 2
        assert len(ds.background_pool) == 2
        # ratios 1:6:1 of 8 -> 1 positive, 6 incomplete, 1 background
        assert (ds.positive_per_video, ds.incomplete_per_video,
                ds.background_per_video) == (1, 6, 1)
        np.random.seed(0)
        out = ds.prepare_train_frames(0)
        assert out['proposal_type'].tolist() == [0] + [1] * 6 + [2]
        assert out['proposal_labels'][0] == 2      # positive keeps label
        assert out['proposal_labels'][-1] == 0     # background -> class 0
        assert out['reg_targets'].shape == (8, 2)
        assert out['proposal_scale_factor'].shape == (8, 2)
        # regression targets of positives are normalized by dataset stats
        assert np.isfinite(out['reg_targets']).all()

    def test_train_step_e2e(self, ssn_root):
        from mscl_tpu.datasets import SSNDataset, default_collate
        train_cfg, test_cfg = self._cfgs()
        pipeline = [
            dict(type='SampleProposalFrames', clip_len=1,
                 body_segments=5, aug_segments=(2, 2), aug_ratio=0.5,
                 mode='train'),
            dict(type='RawFrameDecode'),
            dict(type='Resize', scale=(16, 16), keep_ratio=False),
            dict(type='Normalize', mean=[104, 117, 128], std=[1, 1, 1],
                 to_bgr=True),
            dict(type='FormatShape', input_format='NPTCHW'),
            dict(type='Collect',
                 keys=['imgs', 'reg_targets', 'proposal_scale_factor',
                       'proposal_labels', 'proposal_type'],
                 meta_keys=[]),
            dict(type='ToTensor',
                 keys=['imgs', 'reg_targets', 'proposal_scale_factor',
                       'proposal_labels', 'proposal_type']),
        ]
        ds = SSNDataset(ssn_root['ann'], pipeline=pipeline,
                        train_cfg=train_cfg, test_cfg=test_cfg,
                        data_prefix=ssn_root['root'])
        np.random.seed(0)
        batch = default_collate([ds[0], ds[1]])
        assert batch['imgs'].shape == (2, 8, 9, 3, 16, 16)
        model = RECOGNIZERS.get('SSN')(
            backbone=dict(type='ResNet', depth=18),
            cls_head=dict(type='SSNHead', in_channels=512, num_classes=3,
                          consensus=dict(type='STPPTrain',
                                         stpp_stage=(1, 1, 1),
                                         num_seg=(2, 5, 2)),
                          dropout_ratio=0.0, use_regression=True),
            train_cfg=dict(ssn=dict(
                sampler=dict(num_per_video=8, positive_ratio=1,
                             background_ratio=1, incomplete_ratio=6),
                loss_weight=dict(comp_loss_weight=0.1,
                                 reg_loss_weight=0.1))))
        from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                                   init_state, make_train_step)
        lr = build_lr_schedule(dict(policy='fixed'), 0.01, 1, 1)
        tx = build_optimizer(dict(type='SGD', lr=0.01, momentum=0.9), lr)
        state = init_state(model, tx, batch)
        step = jax.jit(make_train_step(model, tx))
        state, log_vars = step(state, batch)
        for k in ('loss_activity', 'loss_completeness'):
            assert np.isfinite(float(log_vars[k])), log_vars

    def test_evaluate_perfect_detection(self, ssn_root):
        from mscl_tpu.datasets import SSNDataset
        train_cfg, test_cfg = self._cfgs()
        ds = SSNDataset(ssn_root['ann'], pipeline=[],
                        train_cfg=train_cfg, test_cfg=test_cfg,
                        data_prefix=ssn_root['root'], test_mode=True,
                        use_regression=False)
        results = []
        for info in ds.video_infos:
            gt = info['gts'][0]
            rel = np.array([[gt.start_frame / info['total_frames'],
                             gt.end_frame / info['total_frames']]],
                           np.float32)
            act = np.full((1, 4), -5.0, np.float32)
            act[0, 2 + 1] = 5.0   # class label 2 -> activity col 3
            results.append(dict(
                relative_proposal_list=rel, activity_scores=act,
                completeness_scores=np.full((1, 3), 1.0, np.float32),
                bbox_preds=np.zeros((1, 3, 2), np.float32)))
        metrics = ds.evaluate(results)
        # class 1 (label 2) detects its gts perfectly; classes 0/2 have
        # no gt so their AP is 0 (reference eval_ap averages over all
        # classes) -> mAP = 1/3
        assert metrics['mAP@0.50'] == pytest.approx(1 / 3)
        # per-class check: the annotated class alone is perfect
        from mscl_tpu.localization import eval_ap
        dets = ds.results_to_detections(results, top_k=2000)
        gts = ds.get_all_gts()
        ap = eval_ap([dets[1]], [gts[1]], [0.5])
        assert ap[0, 0] == pytest.approx(1.0)


class TestBSNProposalGeneration:
    """BSN PGM (reference bsn_utils.py:9-280): TEM outputs -> candidate
    proposals -> BSP features feeding the PEM."""

    def _video(self, tscale=20):
        rng = np.random.default_rng(0)
        t = np.arange(tscale) / tscale
        # actionness high inside [0.3, 0.6]; start/end peaks at edges
        action = ((t >= 0.3) & (t <= 0.6)).astype(np.float32) * 0.9
        start = np.exp(-((t - 0.3) ** 2) / 0.002).astype(np.float32)
        end = np.exp(-((t - 0.6) ** 2) / 0.002).astype(np.float32)
        tgap = 1.0 / tscale
        tmin = t
        tmax = t + tgap
        tem = np.stack([action, start, end, tmin, tmax],
                       axis=1).astype(np.float32)
        info = dict(video_name='v_test', duration_frame=200,
                    duration_second=20.0, feature_frame=200,
                    annotations=[dict(segment=[6.0, 12.0],
                                      label='x')])
        return tem, info

    def test_candidates_and_bsp(self):
        from mscl_tpu.localization import (generate_bsp_feature,
                                           generate_candidate_proposals)
        tem, info = self._video()
        props = generate_candidate_proposals(
            [0], [info], {'v_test': tem}, temporal_scale=20,
            peak_threshold=0.5)['v_test']
        assert props.shape[1] == 7
        assert len(props) > 0
        # best-scored proposal bracket matches the gt segment (0.3-0.6)
        best = props[0]
        assert 0.2 < best[0] < 0.4 and 0.5 < best[1] < 0.7
        # match_iou column reflects overlap with the gt
        assert props[:, 5].max() > 0.7

        bsp = generate_bsp_feature(
            [0], [info], {'v_test': tem}, {'v_test': props}, top_k=10,
            num_sample_start=4, num_sample_end=4, num_sample_action=8,
            num_sample_interp=2)['v_test']
        assert bsp.shape == (min(10, len(props)), 4 + 4 + 8)
        assert np.isfinite(bsp).all()
        # action region of the best proposal carries high actionness
        assert bsp[0, 8:].mean() > 0.5


class TestSSNTestPath:

    def test_forward_test_scores_feed_evaluate(self, tmp_path_factory):
        """Model test scores -> results_to_detections -> mAP, wiring
        the SSN eval chain end to end on val-mode proposal sampling."""
        import cv2
        from mscl_tpu.datasets import SSNDataset
        root = tmp_path_factory.mktemp('ssn_test')
        rng = np.random.default_rng(0)
        lines = []
        for v in range(2):
            vdir = root / f'video_{v}'
            vdir.mkdir()
            for i in range(1, 121):
                cv2.imwrite(str(vdir / f'img_{i:05d}.jpg'),
                            rng.integers(0, 256, (20, 20, 3),
                                         dtype=np.uint8))
            lines += [f'# {v}', f'video_{v}', '120', '1',
                      '1', '2 30 60', '2',
                      '2 0.80 0.90 28 62', '2 0.75 0.92 32 58']
        ann = root / 'props.txt'
        ann.write_text('\n'.join(lines) + '\n')
        train_cfg = dict(ssn=dict(
            assigner=dict(positive_iou_threshold=0.7,
                          background_iou_threshold=0.01,
                          incomplete_iou_threshold=0.3,
                          background_coverage_threshold=0.02,
                          incomplete_overlap_threshold=0.01),
            sampler=dict(num_per_video=2, positive_ratio=1,
                         background_ratio=0, incomplete_ratio=0,
                         add_gt_as_proposals=False),
            loss_weight=dict(comp_loss_weight=0.1,
                             reg_loss_weight=0.1)))
        test_cfg = dict(ssn=dict(sampler=dict(test_interval=6),
                                 evaluater=dict(top_k=10, nms=0.2)))
        pipeline = [
            dict(type='SampleProposalFrames', clip_len=1,
                 body_segments=5, aug_segments=(2, 2), aug_ratio=0.5,
                 mode='val'),
            dict(type='RawFrameDecode'),
            dict(type='Resize', scale=(16, 16), keep_ratio=False),
            dict(type='Normalize', mean=[104, 117, 128],
                 std=[1, 1, 1], to_bgr=True),
            dict(type='FormatShape', input_format='NPTCHW'),
            dict(type='Collect',
                 keys=['imgs', 'proposal_scale_factor'], meta_keys=[]),
            dict(type='ToTensor',
                 keys=['imgs', 'proposal_scale_factor']),
        ]
        ds = SSNDataset(str(ann), pipeline=pipeline,
                        train_cfg=train_cfg, test_cfg=test_cfg,
                        data_prefix=str(root))
        model = RECOGNIZERS.get('SSN')(
            backbone=dict(type='ResNet', depth=18),
            cls_head=dict(type='SSNHead', in_channels=512,
                          num_classes=3,
                          consensus=dict(type='STPPTrain',
                                         stpp_stage=(1, 1, 1),
                                         num_seg=(2, 5, 2)),
                          dropout_ratio=0.0, use_regression=True),
            train_cfg=train_cfg)
        np.random.seed(0)
        results = []
        variables = None
        for idx in range(len(ds)):
            sample = ds.prepare_train_frames(idx)  # proposal sampling
            imgs = jnp.asarray(np.asarray(sample['imgs'])[None])
            scale = jnp.asarray(
                np.asarray(sample['proposal_scale_factor'])[None])
            if variables is None:
                variables = model.init(
                    {'params': jax.random.PRNGKey(0),
                     'dropout': jax.random.PRNGKey(1)}, imgs, scale)
            act, comp, reg = model.apply(variables, imgs, scale)
            n_props = act.shape[0]
            rel = np.array([[p.start_frame / 120, p.end_frame / 120]
                            for p, _ in zip(
                                ds.video_infos[idx]['proposals'],
                                range(n_props))], np.float32)
            results.append(dict(
                relative_proposal_list=rel[:n_props],
                activity_scores=np.asarray(act)[:len(rel)],
                completeness_scores=np.asarray(comp)[:len(rel)],
                bbox_preds=np.asarray(reg)[:len(rel)]))
        metrics = ds.evaluate(results)
        assert any(k.startswith('mAP@') for k in metrics)
        assert all(np.isfinite(v) for v in metrics.values())


class TestBSNPEMDataPath:
    """BSN PEM end to end through the new LoadProposals data path:
    synthetic PGM proposal csv + BSP feature npy -> LoadProposals ->
    jitted PEM train steps (loss decreases) -> proposal post-processing
    (reference bsn_pem config chain)."""

    def test_pem_trains_on_loaded_proposals(self, tmp_path):
        import optax
        rng = np.random.default_rng(0)
        n_props = 64
        # BSP feature carries the target iou signal so the loss CAN fall
        ious = rng.uniform(0, 1, n_props).astype(np.float32)
        feats = np.concatenate(
            [ious[:, None].repeat(8, 1) +
             rng.normal(scale=0.05, size=(n_props, 8)),
             rng.normal(size=(n_props, 8))], axis=1).astype(np.float32)
        header = 'tmin,tmax,tmin_score,tmax_score,score,match_iou\n'
        rows = [f'{0.1 + 0.005 * i:.3f},{0.2 + 0.005 * i:.3f},'
                f'0.9,0.8,0.7,{ious[i]:.4f}' for i in range(n_props)]
        (tmp_path / 'v_test.csv').write_text(header + '\n'.join(rows))
        np.save(tmp_path / 'v_test.npy', feats)

        from mscl_tpu.datasets.builder import PIPELINES
        load = PIPELINES.module_dict['LoadProposals'](
            top_k=n_props, pgm_proposals_dir=str(tmp_path),
            pgm_features_dir=str(tmp_path))
        r = load(dict(video_name='v_test'))

        pem = RECOGNIZERS.get('PEM')(pem_feat_dim=16, pem_hidden_dim=32)
        batch = dict(
            bsp_feature=jnp.asarray(r['bsp_feature'])[None],
            reference_temporal_iou=jnp.asarray(
                r['reference_temporal_iou'])[None])
        rngs = {'params': jax.random.PRNGKey(0),
                'moco': jax.random.PRNGKey(1)}
        v = pem.init(rngs, batch, method='train_step')
        tx = optax.adam(3e-2)
        opt_state = tx.init(v['params'])

        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                (loss, log_vars) = pem.apply(
                    {'params': p}, batch, method='train_step',
                    rngs={'moco': key})
                return loss
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        params = v['params']
        losses = []
        for i in range(80):
            params, opt_state, loss = step(
                params, opt_state, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.8, losses[::10]

        scores = pem.apply({'params': params},
                           jnp.asarray(r['bsp_feature']),
                           method='forward_test')
        props = pem.proposals_from_outputs(
            scores, r['tmin'], r['tmax'], r['tmin_score'],
            r['tmax_score'],
            dict(video_name='v_test', duration_second=10.0,
                 duration_frame=300, feature_frame=300,
                 annotations=[]))
        assert len(props) > 0


class TestReportMap:
    """ActivityNetDetection (reference eval_detection.py semantics) and
    the tools/analysis/report_map.py CLI on synthetic json files."""

    def _write_jsons(self, tmp_path):
        import json
        gt = {
            'v_a': {'annotations': [
                dict(segment=[0.0, 10.0], label='jump'),
                dict(segment=[20.0, 30.0], label='run')]},
            'v_b': {'annotations': [
                dict(segment=[5.0, 15.0], label='jump')]},
        }
        # class-agnostic proposals (pre-label-assignment)
        proposal = {'results': {
            'a': [dict(segment=[0.0, 10.0], score=0.9),
                  dict(segment=[20.0, 30.0], score=0.8)],
            'b': [dict(segment=[5.0, 15.0], score=0.7)],
        }, 'version': 'VERSION 1.3', 'external_data': {}}
        # video-level classification (cuhk-format)
        cls_pred = {'results': {
            'a': [dict(label='jump', score=0.9),
                  dict(label='run', score=0.1)],
            'b': [dict(label='jump', score=0.8)],
        }}
        paths = {}
        for name, obj in (('gt', gt), ('proposal', proposal),
                          ('cls', cls_pred)):
            p = tmp_path / f'{name}.json'
            p.write_text(json.dumps(obj))
            paths[name] = str(p)
        return paths

    def test_detection_map(self, tmp_path):
        import json
        paths = self._write_jsons(tmp_path)
        det = {'results': {
            'a': [dict(segment=[0.0, 10.0], score=0.9, label='jump'),
                  dict(segment=[20.0, 30.0], score=0.8, label='run')],
            'b': [dict(segment=[5.0, 15.0], score=0.7, label='jump')],
        }}
        det_p = tmp_path / 'det.json'
        det_p.write_text(json.dumps(det))
        from mscl_tpu.localization import ActivityNetDetection
        ev = ActivityNetDetection(paths['gt'], str(det_p))
        mAP, avg = ev.evaluate()
        assert len(mAP) == 10
        np.testing.assert_allclose(mAP, 1.0)      # perfect detections
        assert avg == pytest.approx(1.0)
        # shifted segment: IoU ~0.54 -> correct at low thr, miss at high
        det['results']['b'] = [dict(segment=[8.0, 15.0], score=0.7,
                                    label='jump')]
        det_p.write_text(json.dumps(det))
        mAP2, avg2 = ActivityNetDetection(paths['gt'],
                                          str(det_p)).evaluate()
        assert mAP2[0] == pytest.approx(1.0)       # tIoU 0.5: still hit
        assert mAP2[-1] < 1.0                      # tIoU 0.95: miss
        assert avg2 < avg

    def test_report_map_cli(self, tmp_path):
        import subprocess
        import sys
        paths = self._write_jsons(tmp_path)
        out = subprocess.run(
            [sys.executable,
             osp.join(REPO, 'tools/analysis/report_map.py'),
             '--proposal', paths['proposal'], '--gt', paths['gt'],
             '--cls-pred', paths['cls'],
             '--det-output', str(tmp_path / 'det_out.json')],
            capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stdout + out.stderr
        # cuhk17_top1 labels every proposal of video 'a' as 'jump', so
        # the 'run' gt is missed and 'jump' gets a false positive at
        # [20, 30] -> average mAP printed and < 1
        assert 'Average-mAP' in out.stdout
