"""End-to-end tests of the three reference workloads (SURVEY README:14-36)
at tiny scale on the 8-device CPU mesh:
  1. SSL pretrain  (mscl_r18_cosm_lr2e-2.py semantics)
  2. fine-tune     (test_ssv2_r18.py semantics, incl. ssl_pretrain surgery)
  3. retrieval     (tools/test_retrival.py semantics)
Fixtures: synthetic JPEG frames + np4 flow blobs + MDS pkl annotations on
disk — the full data plane end to end.
"""
import os
import os.path as osp
import pickle
from functools import partial

import cv2
import numpy as np
import pytest

from mscl_tpu import Config
from mscl_tpu.apis import train_model
from mscl_tpu.apis.inference import retrieval_recall
from mscl_tpu.models import BACKBONES
from mscl_tpu.models.backbones.video_resnet import VideoResNet
from mscl_tpu.utils.np4 import np4_encode

if 'test.tiny3d' not in BACKBONES:
    BACKBONES.register_module(
        name='test.tiny3d',
        module=partial(VideoResNet, block='basic',
                       conv_makers=('no_temporal',) * 4,
                       layers=(1, 1, 1, 1), stem='flow_basic',
                       base_width=8))

N_VIDEOS, N_FRAMES, IMG, FLOW_HW = 8, 24, 32, 16
NUM_FRAMES, STRIDE = 4, 2  # tiny clip geometry


@pytest.fixture(scope='module')
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('videos')
    rng = np.random.default_rng(0)
    annos = []
    for v in range(N_VIDEOS):
        vdir = root / f'video_{v}'
        vdir.mkdir()
        frames, flows = [], []
        for i in range(N_FRAMES):
            img = rng.integers(0, 256, (IMG, IMG, 3), dtype=np.uint8)
            p = str(vdir / f'img_{i:05d}.jpg')
            cv2.imwrite(p, img)
            frames.append(p)
        n_flow = (N_FRAMES - 8) // 2
        for i in range(n_flow):
            flow = rng.normal(size=(FLOW_HW, FLOW_HW, 2)).astype(
                np.float32)
            p = str(vdir / f'flow_{i:05d}.np4')
            with open(p, 'wb') as f:
                f.write(np4_encode(flow))
            flows.append(p)
        annos.append(dict(frames=frames, enc_flows=flows,
                          chosen_idx=[0, 1, 2], label=v % 2))
    pkl = str(root / 'train.pkl')
    with open(pkl, 'wb') as f:
        pickle.dump(annos, f)
    return dict(root=str(root), pkl=pkl)


def pretrain_cfg(data_root, work_dir):
    moco = lambda name: dict(   # noqa: E731
        type='MoCoV2',
        backbone=dict(type='test.tiny3d'),
        neck=dict(type='BaseMoCo'),
        moco_head=dict(type='MoCoHead', basename=name,
                       loss_cls=dict(type='CrossEntropyLoss_torch',
                                     ignore_index=-1)),
        im_key='imgs', dim_in=64, dim=16, K=16, m_base=0.9,
        max_iters=200, T=0.07, mlp=True, aux_info=[],
        aug=dict(type='IdentityAug'))
    pipeline = [
        dict(type='MatchFlow', gap=2, adjacent=8, flow_key='nids_flow'),
        dict(type='TemporalShiftChosenSampleFrames', clip_len=NUM_FRAMES,
             frame_interval=STRIDE, num_clips=1, shift_range=1),
        dict(type='LocalDecode'),
        dict(type='NormFlowWithStidedAug', ratios=(0.2, 1.8),
             num_chunks=8, merge_aug=True),
        dict(type='MoCoRandomResizedCrop', area_range=(0.2, 1.0),
             flow_key='flow_imgs'),
        dict(type='MoCoResize', scale=(16, 16), keep_ratio=False,
             flow_key='flow_imgs', suffix='_q'),
        dict(type='MoCoResize', scale=(16, 16), keep_ratio=False,
             flow_key='flow_imgs', suffix='_k'),
        dict(type='MoCoNormalize', ori_flow=True),
        dict(type='Collect', keys=['imgs', 'flow_imgs'], meta_keys=[]),
        dict(type='ToTensor', keys=['imgs', 'flow_imgs'], batched=True),
    ]
    return Config.fromdict(dict(
        model=dict(
            type='MSCLWithAug',
            recognizer=moco(''), recognizer_flow=moco('flow'),
            moco_mx_head=dict(type='MSCLWithAugMxHead', basename='mx',
                              loss_cls=dict(
                                  type='CrossEntropyLoss_torch',
                                  ignore_index=-1),
                              same_kn=True, T=0.07),
            sup_head=dict(type='MSCLWithAugPosHeadV2', basename='',
                          loss_pos=dict(type='CrossEntropyLoss_torch',
                                        ignore_index=-1),
                          bkb_channels=(8, 64), t=NUM_FRAMES // 2, T=0.07,
                          aux_keys=dict(
                              im_features=dict(q_mlvl='q_mlvl'),
                              base_flow_features=dict(
                                  q_mlvl='q_flow_mlvl'),
                              aug_flow_features=dict(
                                  q_mlvl='q_aug_flow_mlvl'))),
            im_key='imgs', flow_key='flow_imgs', aux_info=[],
            update_aug_flow=False, weight_aug_flow=(1.0, 1.0),
            aug=dict(type='SyncMoCoAugmentV5', crop_size=16,
                     sync_level=('batch', 'batch'),
                     t=(NUM_FRAMES, NUM_FRAMES),
                     flow_suffix='flow_imgs', weak_aug=(False, False),
                     visualize=True),
            same_kn=True),
        data=dict(
            videos_per_gpu=1,  # x8 devices = global batch 8
            workers_per_gpu=0,
            train=dict(type='FileRawframeDataset',
                       pkl_path=data_root['pkl'], pipeline=pipeline,
                       extra_keys=['nids_flow', 'chosen_idx']),
            train_dataloader=dict(drop_last=True)),
        optimizer=dict(type='SGD', lr=0.02, momentum=0.9,
                       weight_decay=1e-4),
        optimizer_config=dict(grad_clip=dict(max_norm=40, norm_type=2)),
        lr_config=dict(policy='CosineAnnealing', min_lr=0),
        total_epochs=2,
        checkpoint_config=dict(interval=1),
        log_config=dict(interval=1),
        work_dir=work_dir,
    ))


def finetune_cfg(data_root, work_dir, pretrain_ckpt):
    pipeline = [
        dict(type='SampleFrames', clip_len=1, frame_interval=1,
             num_clips=NUM_FRAMES),
        dict(type='LocalDecode'),
        dict(type='Resize', scale=(-1, 24)),
        dict(type='RandomResizedCrop', area_range=(0.5, 1.0)),
        dict(type='Resize', scale=(16, 16), keep_ratio=False),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375], to_bgr=False),
        dict(type='Seg2T'),
        dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
        dict(type='ToTensor', keys=['imgs', 'label']),
    ]
    val_pipeline = [
        dict(type='SampleFrames', clip_len=1, frame_interval=1,
             num_clips=NUM_FRAMES, test_mode=True),
        dict(type='LocalDecode'),
        dict(type='Resize', scale=(16, 16), keep_ratio=False),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375], to_bgr=False),
        dict(type='Seg2T'),
        dict(type='Collect', keys=['imgs', 'label'], meta_keys=[]),
        dict(type='ToTensor', keys=['imgs', 'label']),
    ]
    ds = dict(type='FileRawframeDataset', pkl_path=data_root['pkl'])
    return Config.fromdict(dict(
        model=dict(
            type='Recognizer3D',
            backbone=dict(type='test.tiny3d'),
            cls_head=dict(type='I3DHead', num_classes=2, in_channels=64,
                          spatial_type='avg', dropout_ratio=0.5),
            train_cfg=dict(ssl_pretrain=dict(
                pretrained=dict(filename=pretrain_ckpt),
                backbone=dict(prefix='recognizer.encoder_q'))),
            test_cfg=dict(average_clips='prob')),
        data=dict(
            videos_per_gpu=1, workers_per_gpu=0,
            train=dict(pipeline=pipeline, **ds),
            val=dict(pipeline=val_pipeline, **ds),
            test=dict(pipeline=val_pipeline, **ds)),
        optimizer=dict(type='SGD', lr=0.05, momentum=0.9,
                       weight_decay=1e-6),
        optimizer_config=dict(grad_clip=dict(max_norm=40, norm_type=2)),
        lr_config=dict(policy='step', step=[1]),
        evaluation=dict(interval=2, metrics=['top_k_accuracy']),
        total_epochs=2,
        checkpoint_config=dict(interval=2),
        log_config=dict(interval=1),
        work_dir=work_dir,
    ))


@pytest.fixture(scope='module')
def pretrain_run(data_root, tmp_path_factory):
    work_dir = str(tmp_path_factory.mktemp('pretrain'))
    cfg = pretrain_cfg(data_root, work_dir)
    runner, state = train_model(cfg, validate=False, seed=0)
    return dict(work_dir=work_dir, state=state, cfg=cfg)


class TestPretrainWorkload:

    def test_runs_and_checkpoints(self, pretrain_run):
        work_dir = pretrain_run['work_dir']
        assert osp.exists(osp.join(work_dir, 'epoch_2.ckpt'))
        assert osp.exists(osp.join(work_dir, 'log.json'))
        state = pretrain_run['state']
        # 2 epochs x 1 batch of global size 8
        assert int(state.step) == 2
        assert int(state.moco_state['recognizer_m']['iters']) == 16

    def test_resume_continues(self, pretrain_run):
        cfg = pretrain_run['cfg']
        cfg.total_epochs = 3
        runner, state = train_model(cfg, validate=False, seed=0,
                                    resume_from=osp.join(
                                        pretrain_run['work_dir'],
                                        'epoch_2.ckpt'))
        assert int(state.step) == 3  # one more epoch only
        # momentum iters resumed, not reset (fidelity fix over reference)
        assert int(state.moco_state['recognizer_m']['iters']) == 24


class TestFinetuneWorkload:

    def test_surgery_and_train(self, data_root, pretrain_run,
                               tmp_path_factory):
        work_dir = str(tmp_path_factory.mktemp('finetune'))
        ckpt = osp.join(pretrain_run['work_dir'], 'epoch_2.ckpt')
        cfg = finetune_cfg(data_root, work_dir, ckpt)
        runner, state = train_model(cfg, validate=True, seed=0)
        # backbone initialized from the SSL encoder_q
        import jax
        from mscl_tpu.core import load_checkpoint
        pre = load_checkpoint(ckpt)
        src = jax.tree.leaves(
            pre['params']['recognizer_m']['encoder_q'])
        # after 2 epochs of training they have moved, but the log proves
        # training ran with eval
        log = open(osp.join(work_dir, 'log.json')).read()
        assert 'top1_acc' in log
        assert len(src) > 0

    def test_surgery_loads_exact_weights(self, data_root, pretrain_run,
                                         tmp_path_factory):
        """Verify the grafted backbone equals the SSL encoder_q exactly
        before any training step (reference base.py:190-203)."""
        import jax
        from mscl_tpu.apis.train import (apply_ssl_pretrain,
                                         build_model_from_cfg,
                                         example_batch_from)
        from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                                   init_state, load_checkpoint)
        from mscl_tpu.datasets import build_dataset
        ckpt_path = osp.join(pretrain_run['work_dir'], 'epoch_2.ckpt')
        cfg = finetune_cfg(data_root, 'unused', ckpt_path)
        model = build_model_from_cfg(dict(cfg.model))
        lr = build_lr_schedule(dict(policy='fixed'), 0.1, 1, 1)
        tx = build_optimizer(dict(type='SGD', lr=0.1), lr)
        ds = build_dataset(dict(cfg.data['train']))
        example = example_batch_from(ds, 8)
        state = init_state(
            model, tx, example,
            post_init_fn=lambda v: apply_ssl_pretrain(
                dict(v),
                dict(cfg.model['train_cfg']['ssl_pretrain'])))
        pre = load_checkpoint(ckpt_path)
        src = jax.tree.leaves(
            pre['params']['recognizer_m']['encoder_q'])
        dst = jax.tree.leaves(state.params['backbone_m'])
        assert len(src) == len(dst)
        assert all(np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(src, dst))


class TestRetrievalWorkload:

    def test_recall_protocol_exact(self):
        """Hand-computable retrieval case: identical features retrieve
        their own class (reference test_retrival.py:286-304 math)."""
        rng = np.random.default_rng(0)
        centers = rng.normal(size=(4, 16)) * 5
        train_feats = np.repeat(centers, 10, axis=0) + \
            rng.normal(size=(40, 16)) * 0.01
        train_labels = np.repeat(np.arange(4), 10)
        test_feats = centers + rng.normal(size=(4, 16)) * 0.01
        test_labels = np.arange(4)
        metrics = retrieval_recall(train_feats, train_labels,
                                   test_feats, test_labels,
                                   topk=(1, 5))
        assert metrics['recall@1'] == 1.0
        assert metrics['recall@5'] == 1.0

    def test_feature_extraction_path(self, data_root, pretrain_run,
                                     tmp_path_factory):
        from mscl_tpu.apis.inference import extract_features
        from mscl_tpu.apis.train import (build_model_from_cfg,
                                         example_batch_from)
        from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                                   init_state)
        from mscl_tpu.datasets import build_dataloader, build_dataset
        cfg = finetune_cfg(data_root, 'unused', 'unused')
        model = build_model_from_cfg(
            {k: v for k, v in dict(cfg.model).items()
             if k != 'train_cfg'})
        lr = build_lr_schedule(dict(policy='fixed'), 0.0, 1, 1)
        tx = build_optimizer(dict(type='SGD', lr=0.0), lr)
        ds_cfg = dict(cfg.data['test'])
        ds_cfg['test_mode'] = True
        ds = build_dataset(ds_cfg)
        loader = build_dataloader(ds, videos_per_gpu=1, num_gpus=8,
                                  shuffle=False)
        example = example_batch_from(ds, 8)
        state = init_state(model, tx, example)
        feats = extract_features(model, state, loader)
        assert feats.shape == (N_VIDEOS, 64)
        labels = [v['label'] for v in ds.video_infos]
        metrics = retrieval_recall(feats, labels, feats, labels,
                                   topk=(1,))
        assert metrics['recall@1'] == 1.0  # self-retrieval


class TestCLISurfaces:

    @pytest.mark.slow
    def test_tools_test_cli(self, data_root, tmp_path_factory):
        """Drive the real `tools/test.py` CLI end-to-end (config file on
        disk -> checkpoint restore -> sharded inference -> metrics json)
        — the one user surface the API-level tests above don't touch."""
        import json
        import runpy
        import sys

        from flax import serialization
        from mscl_tpu.apis.train import (build_model_from_cfg,
                                         example_batch_from)
        from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                                   init_state, save_checkpoint)
        from mscl_tpu.datasets import build_dataset

        work = tmp_path_factory.mktemp('cli_test')
        cfg = finetune_cfg(data_root, str(work), 'unused')
        # an init-state checkpoint is enough to exercise the CLI path
        model = build_model_from_cfg(
            {k: v for k, v in dict(cfg.model).items()
             if k != 'train_cfg'})
        lr = build_lr_schedule(dict(policy='fixed'), 0.0, 1, 1)
        tx = build_optimizer(dict(type='SGD', lr=0.0), lr)
        ds_cfg = dict(cfg.data['test'])
        ds_cfg['test_mode'] = True
        ds = build_dataset(ds_cfg)
        state = init_state(model, tx, example_batch_from(ds, 8))
        ckpt = save_checkpoint(serialization.to_state_dict(state),
                               str(work), epoch=1)

        pipeline = dict(cfg.data['test'])['pipeline']
        cfg_py = work / 'test_cfg.py'
        cfg_py.write_text(
            'model = dict(type="Recognizer3D",\n'
            '    backbone=dict(type="test.tiny3d"),\n'
            '    cls_head=dict(type="I3DHead", num_classes=2,\n'
            '                  in_channels=64, spatial_type="avg",\n'
            '                  dropout_ratio=0.5),\n'
            '    test_cfg=dict(average_clips="prob"))\n'
            'data = dict(videos_per_gpu=1, workers_per_gpu=0,\n'
            f'    test=dict(type="FileRawframeDataset",\n'
            f'              pkl_path={data_root["pkl"]!r},\n'
            f'              pipeline={pipeline!r}))\n')
        out_json = work / 'metrics.json'
        argv = sys.argv
        sys.argv = ['tools/test.py', str(cfg_py), ckpt,
                    '--metrics', 'top_k_accuracy',
                    '--out', str(out_json)]
        try:
            runpy.run_path('tools/test.py', run_name='__main__')
        finally:
            sys.argv = argv
        metrics = json.loads(out_json.read_text())
        assert 'top1_acc' in metrics and 'top5_acc' in metrics
        assert 0.0 <= metrics['top1_acc'] <= 1.0

    @pytest.mark.slow
    def test_tools_test_retrieval_cli(self, data_root,
                                      tmp_path_factory):
        """Drive the real `tools/test_retrieval.py` CLI (train + test
        feature extraction -> kNN recall json)."""
        import json
        import runpy
        import sys

        work = tmp_path_factory.mktemp('cli_retrieval')
        cfg = finetune_cfg(data_root, str(work), 'unused')
        pipeline = dict(cfg.data['test'])['pipeline']
        ds_py = (f'dict(type="FileRawframeDataset",\n'
                 f'     pkl_path={data_root["pkl"]!r},\n'
                 f'     pipeline={pipeline!r})')
        cfg_py = work / 'retrieval_cfg.py'
        cfg_py.write_text(
            'model = dict(type="Recognizer3D",\n'
            '    backbone=dict(type="test.tiny3d"),\n'
            '    cls_head=dict(type="I3DHead", num_classes=2,\n'
            '                  in_channels=64, spatial_type="avg",\n'
            '                  dropout_ratio=0.5),\n'
            '    test_cfg=dict(average_clips="prob"))\n'
            'data = dict(videos_per_gpu=1, workers_per_gpu=0,\n'
            f'    train={ds_py},\n'
            f'    test={ds_py})\n')
        out_json = work / 'recall.json'
        argv = sys.argv
        sys.argv = ['tools/test_retrieval.py', str(cfg_py),
                    '--out', str(out_json)]
        try:
            runpy.run_path('tools/test_retrieval.py',
                           run_name='__main__')
        finally:
            sys.argv = argv
        metrics = json.loads(out_json.read_text())
        # train == test set -> self-retrieval is perfect at any init
        assert metrics['recall@1'] == 1.0
