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
