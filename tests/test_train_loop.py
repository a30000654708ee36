"""End-to-end fine-tune slice on the 8-device CPU mesh: tiny Recognizer3D,
jitted sharded train step, loss goes down, checkpoint roundtrip, LR
schedules, SSL weight surgery (reference workflow test_ssv2_r18.py
semantics at tiny scale — SURVEY §7 step 4)."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscl_tpu.core import (Runner, build_lr_schedule, build_optimizer,
                           init_state, load_checkpoint, make_train_step,
                           save_checkpoint)
from mscl_tpu.core.train_loop import _state_to_dict
from mscl_tpu.models import BACKBONES, RECOGNIZERS
from mscl_tpu.models.backbones.video_resnet import VideoResNet
from mscl_tpu.models.recognizers import init_from_ssl_pretrain
from mscl_tpu.parallel.mesh import create_mesh, shard_batch

# tiny backbone for fast tests
if 'test.tiny3d' not in BACKBONES:
    BACKBONES.register_module(
        name='test.tiny3d',
        module=partial(VideoResNet, block='basic',
                       conv_makers=('no_temporal',) * 4,
                       layers=(1, 1, 1, 1), stem='flow_basic',
                       base_width=8))

NUM_CLASSES = 5


def tiny_model():
    return RECOGNIZERS.get('Recognizer3D')(
        backbone=dict(type='test.tiny3d'),
        cls_head=dict(type='I3DHead', num_classes=NUM_CLASSES,
                      in_channels=64, spatial_type='none',
                      dropout_ratio=0.0),
        test_cfg=dict(average_clips='prob'))


def tiny_batch(bs=8, seed=0):
    rng = np.random.default_rng(seed)
    # NCTHW like the reference pipeline emits (B, 1, C, T, H, W)
    imgs = rng.normal(size=(bs, 1, 3, 4, 16, 16)).astype(np.float32)
    labels = rng.integers(0, NUM_CLASSES, size=(bs,))
    return {'imgs': imgs, 'label': labels}


class TestTrainStep:

    def test_loss_decreases_on_mesh(self):
        assert len(jax.devices()) == 8  # conftest forces 8 CPU devices
        model = tiny_model()
        lr = build_lr_schedule(dict(policy='fixed'), 0.5, 10, 10)
        tx = build_optimizer(dict(type='SGD', lr=0.5, momentum=0.9,
                                  weight_decay=1e-4), lr,
                             grad_clip=dict(max_norm=40))
        batch = tiny_batch()
        state = init_state(model, tx, batch)
        mesh = create_mesh()
        step = jax.jit(make_train_step(model, tx))
        device_batch = shard_batch(batch, mesh)
        losses = []
        for _ in range(8):
            state, log_vars = step(state, device_batch)
            losses.append(float(log_vars['loss']))
        assert losses[-1] < losses[0], losses
        assert 'top1_acc' in log_vars

    def test_checkpoint_roundtrip(self, tmp_path):
        model = tiny_model()
        lr = build_lr_schedule(dict(policy='fixed'), 0.1, 1, 1)
        tx = build_optimizer(dict(type='SGD', lr=0.1, momentum=0.9), lr)
        batch = tiny_batch()
        state = init_state(model, tx, batch)
        step = jax.jit(make_train_step(model, tx))
        state, _ = step(state, batch)
        path = save_checkpoint(_state_to_dict(state), str(tmp_path), 1)
        restored = load_checkpoint(path)
        from flax import serialization
        state2 = serialization.from_state_dict(state, restored)
        chex_equal = jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            jax.device_get(state.params), state2.params)
        assert all(jax.tree.leaves(chex_equal))
        assert int(state2.step) == 1

    def test_eval_mode_no_update(self):
        model = tiny_model()
        lr = build_lr_schedule(dict(policy='fixed'), 0.1, 1, 1)
        tx = build_optimizer(dict(type='SGD', lr=0.1), lr)
        batch = tiny_batch()
        state = init_state(model, tx, batch)
        val_step = jax.jit(make_train_step(model, tx, update=False))
        new_state, log_vars = val_step(state, batch)
        assert int(new_state.step) == 0
        assert np.allclose(
            np.asarray(jax.tree.leaves(state.params)[0]),
            np.asarray(jax.tree.leaves(new_state.params)[0]))
        assert 'loss' in log_vars

    def test_forward_test_softmax_avg(self):
        model = tiny_model()
        batch = tiny_batch(bs=4)
        variables = model.init({'params': jax.random.PRNGKey(0),
                                'dropout': jax.random.PRNGKey(0),
                                'moco': jax.random.PRNGKey(0)},
                               batch, method='train_step')
        imgs = jnp.asarray(
            np.random.default_rng(0).normal(
                size=(2, 3, 3, 4, 16, 16)).astype(np.float32))
        scores = model.apply(
            {'params': variables['params'],
             'batch_stats': variables['batch_stats']},
            imgs, train=False, return_loss=False)
        assert scores.shape == (2, NUM_CLASSES)
        np.testing.assert_allclose(np.asarray(scores.sum(-1)), 1.0,
                                   rtol=1e-5)


class TestLRSchedules:

    def test_step_policy(self):
        # test_ssv2_r18.py:114 — step [14, 18], 22 epochs
        lr = build_lr_schedule(dict(policy='step', step=[14, 18]),
                               0.12, 22, 100)
        assert float(lr(0)) == pytest.approx(0.12)
        assert float(lr(13 * 100)) == pytest.approx(0.12)
        assert float(lr(14 * 100)) == pytest.approx(0.012)
        assert float(lr(18 * 100)) == pytest.approx(0.0012)

    def test_cosine_policy(self):
        lr = build_lr_schedule(
            dict(policy='CosineAnnealing', min_lr=0), 0.02, 400, 50)
        assert float(lr(0)) == pytest.approx(0.02)
        assert float(lr(200 * 50)) == pytest.approx(0.01, rel=1e-3)
        assert float(lr(400 * 50)) == pytest.approx(0.0, abs=1e-8)

    def test_cosine_with_warmup(self):
        lr = build_lr_schedule(
            dict(policy='CosineAnnealing', min_lr=0, warmup='linear',
                 warmup_iters=5, warmup_by_epoch=True, warmup_ratio=0.1),
            0.02, 400, 10)
        assert float(lr(0)) == pytest.approx(0.002, rel=1e-2)
        assert float(lr(50)) == pytest.approx(float(lr(51)), rel=0.05)


class TestSSLSurgery:

    def test_graft_encoder_q_into_backbone(self):
        """reference base.py:190-203: load recognizer.encoder_q params
        into a fine-tune model's backbone, skipping 'fc' extras."""
        model = tiny_model()
        batch = tiny_batch(bs=2)
        rngs = {'params': jax.random.PRNGKey(0),
                'dropout': jax.random.PRNGKey(0),
                'moco': jax.random.PRNGKey(0)}
        variables = model.init(rngs, batch, method='train_step')
        variables = {'params': variables['params'],
                     'batch_stats': variables['batch_stats']}

        # fake SSL checkpoint: same backbone under recognizer/encoder_q
        bb = BACKBONES.get('test.tiny3d')()
        x = jnp.zeros((1, 4, 16, 16, 3))
        bb_vars = bb.init(jax.random.PRNGKey(42), x)
        ckpt = {'params': {'recognizer': {'encoder_q':
                                          bb_vars['params']}},
                'batch_stats': {'recognizer': {'encoder_q':
                                               bb_vars['batch_stats']}}}
        new_vars = init_from_ssl_pretrain(
            variables, ckpt, module_name='backbone_m',
            prefix='recognizer.encoder_q', extras=('fc',))
        got = jax.tree.leaves(new_vars['params']['backbone_m'])
        want = jax.tree.leaves(bb_vars['params'])
        assert all(np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(got, want))
        # head untouched
        same_head = jax.tree.map(
            np.array_equal, new_vars['params']['cls_head_m'],
            variables['params']['cls_head_m'])
        assert all(jax.tree.leaves(same_head))


class TestTINScheduleAndTSMOptimizer:

    def test_tin_schedule(self):
        from mscl_tpu.core import build_lr_schedule
        s = build_lr_schedule(
            dict(policy='TIN', min_lr=0.001, warmup='linear',
                 warmup_iters=10, warmup_ratio=0.1, by_epoch=False),
            0.1, 1, 1)
        # TIN linear warmup: lr(0) = base * ratio, ramps to base
        assert float(s(0)) == pytest.approx(0.01, rel=1e-4)
        assert float(s(10)) == pytest.approx(0.1, rel=1e-4)
        # anneals toward min_lr afterwards
        assert float(s(50)) == pytest.approx(0.001, rel=1e-3)

    def test_tsm_param_groups(self):
        import jax
        import jax.numpy as jnp
        from mscl_tpu.core import build_lr_schedule, build_optimizer
        params = {
            'backbone': {'conv1': {
                'conv': {'kernel': jnp.ones((3, 3, 4, 4)),
                         'bias': jnp.ones(4)},
                'bn': {'scale': jnp.ones(4), 'bias': jnp.ones(4)}}},
            'cls_head': {'fc_cls': {'kernel': jnp.ones((4, 2)),
                                    'bias': jnp.ones(2)}}}
        lr = build_lr_schedule(dict(policy='fixed'), 1.0, 1, 1)
        tx = build_optimizer(
            dict(type='SGD', lr=1.0, momentum=0.0, weight_decay=0.0,
                 constructor='TSMOptimizerConstructor',
                 paramwise_cfg=dict(fc_lr5=True)), lr)
        ups, _ = tx.update(jax.tree.map(jnp.ones_like, params),
                           tx.init(params), params)
        def get(*ks):
            node = ups
            for k in ks:
                node = node[k]
            return float(node.reshape(-1)[0])
        assert get('backbone', 'conv1', 'conv', 'kernel') == -1.0
        assert get('backbone', 'conv1', 'conv', 'bias') == -2.0
        assert get('backbone', 'conv1', 'bn', 'scale') == -1.0
        assert get('cls_head', 'fc_cls', 'kernel') == -5.0
        assert get('cls_head', 'fc_cls', 'bias') == -10.0

    def test_custom_keys_param_groups(self):
        """paramwise_cfg.custom_keys (mmcv DefaultOptimizerConstructor,
        reference timesformer/TIN configs): lr_mult scales the update,
        decay_mult scales wd, longest key wins, dotted keys match
        '/'-joined paths; freeze_patterns still zero their subtree."""
        import jax
        import jax.numpy as jnp
        from mscl_tpu.core import build_lr_schedule, build_optimizer
        params = {
            'backbone': {'cls_token': jnp.ones(4),
                         'pos_embed': jnp.ones(4),
                         'blocks': {'kernel': jnp.ones(4)}},
            'head': {'kernel': jnp.ones(4)}}
        lr = build_lr_schedule(dict(policy='fixed'), 1.0, 1, 1)
        tx = build_optimizer(
            dict(type='SGD', lr=1.0, momentum=0.0, weight_decay=0.1,
                 paramwise_cfg=dict(custom_keys={
                     '.backbone.cls_token': dict(decay_mult=0.0),
                     '.backbone': dict(lr_mult=0.5)})),
            lr, freeze_patterns=('head',))
        grads = jax.tree.map(jnp.ones_like, params)
        ups, _ = tx.update(grads, tx.init(params), params)
        # cls_token: longest key wins -> wd off, lr_mult default 1
        assert float(ups['backbone']['cls_token'][0]) == \
            pytest.approx(-1.0)
        # pos_embed: '.backbone' -> lr_mult 0.5, wd on (grad 1 + 0.1*1)
        assert float(ups['backbone']['pos_embed'][0]) == \
            pytest.approx(-0.55)
        assert float(ups['backbone']['blocks']['kernel'][0]) == \
            pytest.approx(-0.55)
        assert float(ups['head']['kernel'][0]) == 0.0


class TestPreemptionCheckpoint:

    def test_sigterm_saves_resumable_checkpoint(self, tmp_path):
        """A real SIGTERM to the process mid-epoch checkpoints at the
        next step boundary, moves 'latest', and exits 143; a fresh
        runner resumes from it and finishes (SURVEY §5: the reference
        has no failure handling)."""
        import os
        import signal
        from mscl_tpu.core import build_lr_schedule, build_optimizer, \
            init_state
        from mscl_tpu.datasets import NumpyLoader

        class DS:
            def __init__(self, n=16):
                self.n = n
                self.rng = np.random.default_rng(0)
                self.video_infos = [dict(label=i % 2) for i in range(n)]

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                return dict(imgs=self.rng.random(
                    (1, 3, 4, 16, 16)).astype(np.float32),
                    label=np.int64(i % 2))

        def make_runner(trigger):
            from mscl_tpu.models import RECOGNIZERS
            model = RECOGNIZERS.get('Recognizer3D')(
                backbone=dict(type='resnet_flow.r2d_18'),
                cls_head=dict(type='I3DHead', num_classes=2,
                              in_channels=128, spatial_type='avg',
                              dropout_ratio=0.0))
            loader = NumpyLoader(DS(), batch_size=8, shuffle=False)
            lr = build_lr_schedule(dict(policy='fixed'), 0.01, 1, 1)
            tx = build_optimizer(dict(type='SGD', lr=0.01,
                                      momentum=0.9), lr)
            runner = Runner(model, tx, loader,
                            cfg=dict(total_epochs=2,
                                     log_config=dict(interval=1),
                                     checkpoint_config=dict(interval=5)),
                            work_dir=str(tmp_path))
            if trigger:
                # deliver a REAL SIGTERM after the first logged iter
                orig_log = runner.log

                def log_and_kill(record):
                    orig_log(record)
                    if record.get('mode') == 'train':
                        os.kill(os.getpid(), signal.SIGTERM)
                runner.log = log_and_kill
            state = init_state(model, tx, next(iter(loader)))
            return runner, state

        prev = signal.getsignal(signal.SIGTERM)
        try:
            runner, state = make_runner(trigger=True)
            with pytest.raises(SystemExit) as exc:
                runner.run(state)
            assert exc.value.code == 128 + signal.SIGTERM
            ckpts = [p for p in os.listdir(tmp_path)
                     if p.startswith('preempt_') and p.endswith('.ckpt')]
            assert len(ckpts) == 1
            latest = open(tmp_path / 'latest').read().strip()
            assert latest == ckpts[0]
            log = open(tmp_path / 'log.json').read()
            assert '"mode": "preempt"' in log

            # fresh runner resumes from the preempt checkpoint and
            # completes the remaining epochs
            runner2, state2 = make_runner(trigger=False)
            state2 = runner2.resume(state2)
            assert runner2.epoch == 0  # interrupted epoch re-runs
            steps_before = int(jax.device_get(state2.step))
            assert steps_before >= 1   # preempted state carried over
            final = runner2.run(state2)
            assert int(jax.device_get(final.step)) == steps_before + 4
        finally:
            signal.signal(signal.SIGTERM, prev)


class TestPreciseBN:

    def test_precise_bn_cfg_refreshes_stats(self, tmp_path):
        """cfg.precise_bn=dict(num_iters, interval) runs the
        PreciseBNHook equivalent after each interval epochs (reference
        apis/train.py:127-139): BN running stats move beyond what the
        plain train epoch left, params untouched by the refresh."""
        from mscl_tpu.core import build_lr_schedule, build_optimizer, \
            init_state
        from mscl_tpu.datasets import NumpyLoader
        from mscl_tpu.models import RECOGNIZERS

        class DS:
            def __init__(self, n=8):
                self.n = n
                self.rng = np.random.default_rng(0)
                self.video_infos = [dict(label=i % 2) for i in range(n)]

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                return dict(imgs=self.rng.random(
                    (1, 3, 4, 16, 16)).astype(np.float32),
                    label=np.int64(i % 2))

        def run(precise_bn):
            model = RECOGNIZERS.get('Recognizer3D')(
                backbone=dict(type='resnet_flow.r2d_18'),
                cls_head=dict(type='I3DHead', num_classes=2,
                              in_channels=128, spatial_type='avg',
                              dropout_ratio=0.0))
            loader = NumpyLoader(DS(), batch_size=8, shuffle=False)
            lr = build_lr_schedule(dict(policy='fixed'), 0.01, 1, 1)
            tx = build_optimizer(dict(type='SGD', lr=0.01,
                                      momentum=0.9), lr)
            cfg = dict(total_epochs=1, log_config=dict(interval=100),
                       checkpoint_config=dict(interval=5))
            if precise_bn:
                cfg['precise_bn'] = dict(num_iters=3, interval=1)
            runner = Runner(model, tx, loader, cfg=cfg,
                            work_dir=str(tmp_path / f'w{precise_bn}'))
            state = init_state(model, tx, next(iter(loader)))
            return jax.device_get(runner.run(state))

        plain, refreshed = run(False), run(True)
        # params identical (precise_bn only touches batch_stats)...
        for a, b in zip(jax.tree_util.tree_leaves(plain.params),
                        jax.tree_util.tree_leaves(refreshed.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # ...while at least one BN running stat moved
        diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
                 for a, b in zip(
                     jax.tree_util.tree_leaves(plain.batch_stats),
                     jax.tree_util.tree_leaves(refreshed.batch_stats))]
        assert max(diffs) > 0, 'precise_bn did not refresh stats'


class TestOmniSourceRunner:

    def test_aux_sources_trained_and_logged(self, tmp_path):
        import jax
        import numpy as np
        from mscl_tpu.core import (OmniSourceRunner, build_lr_schedule,
                                   build_optimizer, init_state)
        from mscl_tpu.datasets import NumpyLoader
        from mscl_tpu.models import RECOGNIZERS

        model = RECOGNIZERS.get('Recognizer3D')(
            backbone=dict(type='resnet_flow.r2d_18'),
            cls_head=dict(type='I3DHead', num_classes=2,
                          in_channels=128, spatial_type='avg',
                          dropout_ratio=0.0))

        class DS:
            def __init__(self, n, seed):
                self.n = n
                self.rng = np.random.default_rng(seed)
                self.video_infos = [dict(label=i % 2) for i in range(n)]

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                return dict(
                    imgs=self.rng.random((1, 3, 4, 16, 16)).astype(
                        np.float32),
                    label=np.int64(i % 2))

        main = NumpyLoader(DS(16, 0), batch_size=8, shuffle=False)
        aux = NumpyLoader(DS(8, 1), batch_size=8, shuffle=False)
        lr = build_lr_schedule(dict(policy='fixed'), 0.01, 1, 1)
        tx = build_optimizer(dict(type='SGD', lr=0.01, momentum=0.9), lr)
        runner = OmniSourceRunner(
            model, tx, main,
            cfg=dict(total_epochs=1, log_config=dict(interval=1),
                     checkpoint_config=dict(interval=1)),
            work_dir=str(tmp_path), aux_loaders=[aux],
            train_ratio=[1, 2])
        state = init_state(model, tx, main_batch := next(iter(main)))
        state = runner.run(state)
        # 2 main batches + 2 aux steps each = 6 optimizer steps
        assert int(state.step) == 6
        log = open(tmp_path / 'log.json').read()
        assert 'loss/aux0' in log
