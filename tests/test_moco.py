"""MoCo tower + MSCL composite tests on the 8-device CPU mesh — queue
mechanics, EMA momentum, temporal-decay weighting, FRA negatives, and the
full composite loss surface (reference semantics in moco.py / mscl.py)."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscl_tpu.core import build_lr_schedule, build_optimizer, init_state, \
    make_train_step
from mscl_tpu.models import BACKBONES, RECOGNIZERS
from mscl_tpu.models.backbones.video_resnet import VideoResNet
from mscl_tpu.models.common.ssl_aug import FlowVisualizer
from mscl_tpu.models.recognizers import (build_ema_fn, sync_key_variables)
from mscl_tpu.models.recognizers.moco import momentum_schedule_from_cfg
from mscl_tpu.parallel.mesh import create_mesh, shard_batch
from mscl_tpu.utils.flow_viz import flow_to_image

if 'test.tiny3d' not in BACKBONES:
    BACKBONES.register_module(
        name='test.tiny3d',
        module=partial(VideoResNet, block='basic',
                       conv_makers=('no_temporal',) * 4,
                       layers=(1, 1, 1, 1), stem='flow_basic',
                       base_width=8))

DIM, K, BS, T, HW = 16, 32, 8, 4, 16


def moco_cfg(basename=''):
    return dict(
        backbone=dict(type='test.tiny3d'),
        neck=dict(type='BaseMoCo'),
        moco_head=dict(type='MoCoHead', basename=basename,
                       loss_cls=dict(type='CrossEntropyLoss_torch',
                                     ignore_index=-1)),
        im_key='imgs', dim_in=64, dim=DIM, K=K, m_base=0.9,
        max_iters=1000, T=0.07, mlp=True, aux_info=[],
        aug=dict(type='IdentityAug'))


def moco_batch(seed=0):
    rng = np.random.default_rng(seed)
    return {'imgs': [
        rng.uniform(size=(BS, 3, T, HW, HW)).astype(np.float32),
        rng.uniform(size=(BS, 3, T, HW, HW)).astype(np.float32)]}


def build_moco():
    cfg = moco_cfg()
    model = RECOGNIZERS.get('MoCoV2')(**cfg)
    lr = build_lr_schedule(dict(policy='fixed'), 0.1, 1, 1)
    tx = build_optimizer(
        dict(type='SGD', lr=0.1, momentum=0.9, weight_decay=1e-4), lr,
        grad_clip=dict(max_norm=40),
        freeze_patterns=('encoder_k', 'neck_k', 'mlp_k'))
    return model, tx


class TestMomentumSchedule:

    def test_cosine_anneal(self):
        sched = momentum_schedule_from_cfg(
            'MoCoV2', dict(m_base=0.994, max_iters=100))
        # reference moco.py:408-421: m(0)=m_base, m(max)=1
        assert float(sched(jnp.asarray(0))) == pytest.approx(0.994)
        assert float(sched(jnp.asarray(50))) == pytest.approx(
            1 - 0.5 * (1 - 0.994), rel=1e-6)
        assert float(sched(jnp.asarray(100))) == pytest.approx(1.0)
        assert float(sched(jnp.asarray(500))) == pytest.approx(1.0)

    def test_fixed(self):
        sched = momentum_schedule_from_cfg('MoCo', dict(m=0.999))
        assert float(sched(jnp.asarray(123))) == pytest.approx(0.999)


class TestMoCoV2:

    def test_queue_mechanics_and_ema(self):
        model, tx = build_moco()
        batch = moco_batch()
        state = init_state(model, tx, batch,
                           post_init_fn=sync_key_variables)

        # q == k after init sync
        pq = jax.tree.leaves(state.params['encoder_q'])
        pk = jax.tree.leaves(state.params['encoder_k'])
        assert all(np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(pq, pk))

        ms = state.moco_state
        assert ms['queue'].shape == (DIM, K)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(ms['queue']), axis=0), 1.0,
            rtol=1e-5)
        assert int(ms['queue_ptr']) == 0
        assert np.all(np.asarray(ms['count']) == 0)

        step = jax.jit(make_train_step(model, tx, build_ema_fn(model)))
        state1, log_vars = step(state, batch)
        assert 'loss_cls' in log_vars and 'top1_acc' in log_vars
        ms1 = state1.moco_state
        # ptr advanced by global batch; enqueued slots count=1, others +1
        assert int(ms1['queue_ptr']) == BS
        cnt = np.asarray(ms1['count'])
        assert np.all(cnt[:BS] == 1) and np.all(cnt[BS:] == 1)
        assert int(ms1['iters']) == BS

        state2, _ = step(state1, batch)
        cnt2 = np.asarray(state2.moco_state['count'])
        assert int(state2.moco_state['queue_ptr']) == 2 * BS
        assert np.all(cnt2[:BS] == 2)        # aged by one update
        assert np.all(cnt2[BS:2 * BS] == 1)  # freshly enqueued
        assert int(state2.moco_state['iters']) == 2 * BS

        # queue wraps after K/BS steps
        for _ in range(2):
            state2, _ = step(state2, batch)
        assert int(state2.moco_state['queue_ptr']) == 0

    def test_ema_moves_k_towards_q(self):
        model, tx = build_moco()
        batch = moco_batch()
        state = init_state(model, tx, batch,
                           post_init_fn=sync_key_variables)
        step = jax.jit(make_train_step(model, tx, build_ema_fn(model)))
        state1, _ = step(state, batch)
        state2, _ = step(state1, batch)
        # exact EMA semantics: k(2) = m*k(1) + (1-m)*q(1) with m computed
        # at iters(1) (the pre-forward momentum update,
        # reference moco.py:408-421 + 528-530)
        m = float(momentum_schedule_from_cfg(
            'MoCoV2', dict(m_base=0.9, max_iters=1000))(
                state1.moco_state['iters']))
        k1 = np.asarray(jax.tree.leaves(state1.params['encoder_k'])[0])
        q1 = np.asarray(jax.tree.leaves(state1.params['encoder_q'])[0])
        k2 = np.asarray(jax.tree.leaves(state2.params['encoder_k'])[0])
        np.testing.assert_allclose(k2, m * k1 + (1 - m) * q1, rtol=1e-5)
        q2 = np.asarray(jax.tree.leaves(state2.params['encoder_q'])[0])
        assert not np.array_equal(q2, k2)

    def test_queue_updated_with_keys(self):
        model, tx = build_moco()
        batch = moco_batch()
        state = init_state(model, tx, batch,
                           post_init_fn=sync_key_variables)
        step = jax.jit(make_train_step(model, tx, build_ema_fn(model)))
        state1, _ = step(state, batch)
        q0 = np.asarray(state.moco_state['queue'])
        q1 = np.asarray(state1.moco_state['queue'])
        # first BS columns replaced with unit-norm keys, rest unchanged
        assert not np.allclose(q0[:, :BS], q1[:, :BS])
        np.testing.assert_allclose(q0[:, BS:], q1[:, BS:])
        np.testing.assert_allclose(np.linalg.norm(q1[:, :BS], axis=0),
                                   1.0, rtol=1e-4)

    def test_forward_train_pair_matches_two_passes(self):
        """forward_train_pair (the MSCL_FLOW_BATCHED tower-stacking path)
        must equal two sequential forward_train calls exactly when BN
        uses running stats (train=False isolates the one documented
        divergence: joint vs per-pass batch statistics)."""
        model, tx = build_moco()
        ba, bb = moco_batch(1), moco_batch(2)
        state = init_state(model, tx, ba, post_init_fn=sync_key_variables)
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats,
                     'moco_state': state.moco_state}
        nthwc = lambda x: jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1))
        qa, ka = nthwc(ba['imgs'][0]), nthwc(ba['imgs'][1])
        qb, kb = nthwc(bb['imgs'][0]), nthwc(bb['imgs'][1])
        rngs = {'moco': jax.random.PRNGKey(7)}

        (la, fa), v1 = model.apply(
            variables, qa, ka, {}, return_features=True, train=False,
            method='forward_train', mutable=['moco_state'], rngs=rngs)
        (lb, fb), v2 = model.apply(
            {**variables, 'moco_state': v1['moco_state']}, qb, kb, {},
            return_features=True, update_queue=True, train=False,
            method='forward_train', mutable=['moco_state'], rngs=rngs)

        ((pla, pfa), (plb, pfb)), vp = model.apply(
            variables, qa, ka, qb, kb, {}, update_queue_b=True,
            train=False, method='forward_train_pair',
            mutable=['moco_state'], rngs=rngs)

        for sep, pair in ((la, pla), (lb, plb)):
            for key in sep:
                np.testing.assert_allclose(np.asarray(sep[key]),
                                           np.asarray(pair[key]),
                                           rtol=1e-5, atol=1e-5)
        for sep, pair in ((fa, pfa), (fb, pfb)):
            np.testing.assert_allclose(np.asarray(sep['q']),
                                       np.asarray(pair['q']),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(sep['k']),
                                       np.asarray(pair['k']),
                                       rtol=1e-5, atol=1e-5)
        # queue bookkeeping: both passes enqueued, in order (a then b)
        ms_sep, ms_pair = v2['moco_state'], vp['moco_state']
        assert int(ms_pair['queue_ptr']) == int(ms_sep['queue_ptr'])
        np.testing.assert_allclose(np.asarray(ms_sep['queue']),
                                   np.asarray(ms_pair['queue']),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(ms_sep['count']),
                                      np.asarray(ms_pair['count']))

    def test_runs_sharded_on_mesh(self):
        model, tx = build_moco()
        batch = moco_batch()
        state = init_state(model, tx, batch,
                           post_init_fn=sync_key_variables)
        mesh = create_mesh()
        step = jax.jit(make_train_step(model, tx, build_ema_fn(model)))
        device_batch = shard_batch(batch, mesh)
        state1, log_vars = step(state, device_batch)
        assert np.isfinite(float(log_vars['loss']))


def mscl_model_cfg():
    rgb = dict(type='MoCoV2', **moco_cfg())
    flow = dict(type='MoCoV2', **moco_cfg(basename='flow'))
    return dict(
        recognizer=rgb, recognizer_flow=flow,
        moco_mx_head=dict(type='MSCLWithAugMxHead', basename='mx',
                          loss_cls=dict(type='CrossEntropyLoss_torch',
                                        ignore_index=-1),
                          same_kn=True, T=0.07),
        sup_head=dict(type='MSCLWithAugPosHeadV2', basename='',
                      loss_pos=dict(type='CrossEntropyLoss_torch',
                                    ignore_index=-1),
                      bkb_channels=(8, 64), t=T // 2, T=0.07,
                      aux_keys=dict(
                          im_features=dict(q_mlvl='q_mlvl'),
                          base_flow_features=dict(
                              q_mlvl='q_flow_mlvl'),
                          aug_flow_features=dict(
                              q_mlvl='q_aug_flow_mlvl'))),
        im_key='imgs', flow_key='flow_imgs', aux_info=[],
        update_aug_flow=False, weight_aug_flow=(1.0, 1.0),
        aug=dict(type='SyncMoCoAugmentV5', crop_size=HW,
                 sync_level=('batch', 'batch'), t=(T, T),
                 flow_suffix='flow_imgs', weak_aug=(False, False),
                 visualize=True),
        same_kn=True)


def mscl_batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        'imgs': [rng.uniform(size=(BS, 3, T, HW, HW)).astype(np.float32)
                 for _ in range(2)],
        # concatenated base+rotated flow: 2T frames of raw (u, v)
        'flow_imgs': [rng.normal(size=(BS, 2, 2 * T, HW, HW))
                      .astype(np.float32) for _ in range(2)],
    }


class TestMSCLWithAug:

    def test_full_composite_losses(self):
        model = RECOGNIZERS.get('MSCLWithAug')(**mscl_model_cfg())
        lr = build_lr_schedule(dict(policy='fixed'), 0.02, 1, 1)
        tx = build_optimizer(
            dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=1e-4),
            lr, grad_clip=dict(max_norm=40),
            freeze_patterns=('encoder_k', 'neck_k', 'mlp_k'))
        batch = mscl_batch()
        state = init_state(model, tx, batch,
                           post_init_fn=sync_key_variables)
        mesh = create_mesh()
        step = jax.jit(make_train_step(model, tx, build_ema_fn(model)))
        state1, log_vars = step(state, shard_batch(batch, mesh))
        # the full MSCL loss surface (reference mscl.py:225-277)
        for key in ['loss_cls',            # RGB InfoNCE
                    'loss_cls_flow',       # base flow InfoNCE
                    'loss_cls_flow_aug',   # FRA-rotated flow InfoNCE
                    'loss_cls_mx', 'loss_cls_mx_r',        # cross-modal
                    'loss_cls_mx_aug', 'loss_cls_mx_r_aug',
                    'loss_pos',            # LMCL
                    'loss']:
            assert key in log_vars, (key, sorted(log_vars))
            assert np.isfinite(float(log_vars[key])), key

        # FRA pass must NOT touch the flow queue (update_aug_flow=False):
        # flow ptr advanced once (base pass), not twice
        assert int(state1.moco_state['recognizer_flow_m']
                   ['queue_ptr']) == BS
        assert int(state1.moco_state['recognizer_m']['queue_ptr']) == BS
        # flow tower iters advance twice per step (reference quirk,
        # moco.py:506-507 — both flow forwards count)
        assert int(state1.moco_state['recognizer_flow_m']
                   ['iters']) == 2 * BS
        assert int(state1.moco_state['recognizer_m']['iters']) == BS

    def test_batched_flow_passes_composite(self):
        """batch_flow_passes=True (MSCL_FLOW_BATCHED): same loss surface
        and same queue/iters bookkeeping as the two-pass path (values
        differ only through joint-vs-per-pass BN batch stats)."""
        model = RECOGNIZERS.get('MSCLWithAug')(
            **mscl_model_cfg(), batch_flow_passes=True)
        lr = build_lr_schedule(dict(policy='fixed'), 0.02, 1, 1)
        tx = build_optimizer(
            dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=1e-4),
            lr, grad_clip=dict(max_norm=40),
            freeze_patterns=('encoder_k', 'neck_k', 'mlp_k'))
        batch = mscl_batch()
        state = init_state(model, tx, batch,
                           post_init_fn=sync_key_variables)
        step = jax.jit(make_train_step(model, tx, build_ema_fn(model)))
        state1, log_vars = step(state, batch)
        for key in ['loss_cls', 'loss_cls_flow', 'loss_cls_flow_aug',
                    'loss_cls_mx', 'loss_cls_mx_r', 'loss_cls_mx_aug',
                    'loss_cls_mx_r_aug', 'loss_pos', 'loss']:
            assert key in log_vars, (key, sorted(log_vars))
            assert np.isfinite(float(log_vars[key])), key
        # bookkeeping identical to the two-pass path
        assert int(state1.moco_state['recognizer_flow_m']
                   ['queue_ptr']) == BS
        assert int(state1.moco_state['recognizer_flow_m']
                   ['iters']) == 2 * BS

    def test_loss_decreases(self):
        model = RECOGNIZERS.get('MSCLWithAug')(**mscl_model_cfg())
        lr = build_lr_schedule(dict(policy='fixed'), 0.05, 1, 1)
        tx = build_optimizer(
            dict(type='SGD', lr=0.05, momentum=0.9), lr,
            freeze_patterns=('encoder_k', 'neck_k', 'mlp_k'))
        batch = mscl_batch()
        state = init_state(model, tx, batch,
                           post_init_fn=sync_key_variables)
        step = jax.jit(make_train_step(model, tx, build_ema_fn(model)))
        losses = []
        for _ in range(6):
            state, log_vars = step(state, batch)
            losses.append(float(log_vars['loss']))
        assert losses[-1] < losses[0], losses


class TestFlowVisualizerParity:

    def test_matches_numpy_flow_viz(self):
        """Device color wheel == host color wheel (up to the /255)."""
        rng = np.random.default_rng(0)
        flow = rng.normal(size=(6, 6, 2)).astype(np.float32)
        # normalize like norm_flow so |uv| <= 1 (the pipeline does this)
        rad = np.sqrt((flow ** 2).sum(-1)).max()
        flow_n = flow / (rad + 1e-5)
        host = flow_to_image(flow_n).astype(np.float32) / 255.0
        dev = np.asarray(FlowVisualizer()(
            jnp.asarray(flow_n)[None, None])[0, 0])
        np.testing.assert_allclose(dev, host, atol=1.5 / 255)


class TestShuffleBN:
    """Faithful ShuffleBN option (reference moco.py:146-191): per-group
    key-encoder BN stats over a shared-PRNG global permutation."""

    def _run(self, shuffle_bn, seed=0):
        cfg = moco_cfg()
        model = RECOGNIZERS.get('MoCoV2')(shuffle_bn=shuffle_bn, **cfg)
        batch = moco_batch(seed)
        rng = jax.random.PRNGKey(seed)
        variables = model.init(
            {'params': rng, 'dropout': rng, 'moco': rng}, batch,
            method='train_step')
        variables = sync_key_variables(variables)
        (loss, log_vars), updates = model.apply(
            variables, batch, method='train_step',
            mutable=['batch_stats', 'moco_state'],
            rngs={'dropout': jax.random.PRNGKey(1),
                  'moco': jax.random.PRNGKey(2)})
        return float(loss), variables, updates

    def test_runs_and_differs_from_global_bn(self):
        loss_g, _, _ = self._run(0)
        loss_s, _, _ = self._run(4)
        assert np.isfinite(loss_g) and np.isfinite(loss_s)
        # per-group stats change the key features, so the loss moves
        assert loss_g != loss_s

    def test_q_unchanged_k_stats_localized(self):
        """shuffle_bn only alters the KEY branch: q features are
        bit-identical to the global-BN model under the same params,
        while k features move (per-group stats differ from global)."""
        cfg = moco_cfg()
        model = RECOGNIZERS.get('MoCoV2')(shuffle_bn=2, **cfg)
        batch = moco_batch(0)
        rng = jax.random.PRNGKey(0)
        variables = model.init(
            {'params': rng, 'dropout': rng, 'moco': rng}, batch,
            method='train_step')
        variables = sync_key_variables(variables)
        im_q = jnp.asarray(np.transpose(batch['imgs'][0],
                                        (0, 2, 3, 4, 1)))
        im_k = jnp.asarray(np.transpose(batch['imgs'][1],
                                        (0, 2, 3, 4, 1)))
        moco_rng = jax.random.PRNGKey(7)
        (q, _, k, _), _ = model.apply(
            variables, im_q, im_k, True, method='extract_feat',
            mutable=['batch_stats'], rngs={'moco': moco_rng})
        model_g = RECOGNIZERS.get('MoCoV2')(shuffle_bn=0, **cfg)
        (q2, _, k2, _), _ = model_g.apply(
            variables, im_q, im_k, True, method='extract_feat',
            mutable=['batch_stats'], rngs={'moco': moco_rng})
        np.testing.assert_allclose(np.asarray(q), np.asarray(q2),
                                   rtol=1e-5, atol=1e-5)
        assert not np.allclose(np.asarray(k), np.asarray(k2), atol=1e-6)
        # keys are still unit-normalized in both modes
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(k), axis=1), 1.0, atol=1e-3)


def test_color_jitter_bf16_stays_bf16_and_tracks_f32():
    """The jitter applies f32-sampled factors in the clip dtype: a bf16
    clip must come out bf16 (no silent f32 promotion of the aug math)
    and stay within bf16 rounding of the f32 computation."""
    import jax
    from mscl_tpu.models.common.ssl_aug import color_jitter_video
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, size=(2, 4, 16, 16, 3)).astype(np.float32)
    key = jax.random.PRNGKey(11)
    out32 = color_jitter_video(key, jnp.asarray(imgs), p=1.0)
    assert out32.dtype == jnp.float32
    out16 = color_jitter_video(
        key, jnp.asarray(imgs, jnp.bfloat16), p=1.0)
    assert out16.dtype == jnp.bfloat16
    # hue wraps at 1.0, so a ~bf16-eps hue difference can land on
    # opposite sides of the wheel for a few pixels; compare the bulk
    diff = np.abs(np.asarray(out16, np.float32) - np.asarray(out32))
    assert np.quantile(diff, 0.999) < 0.05, diff.max()


def test_gaussian_blur_reflect_borders():
    """Blur kernel + reflect border semantics match kornia's
    GaussianBlur2d (normalized gaussian window, border_type='reflect'),
    checked against a dense numpy reference."""
    import jax
    from mscl_tpu.models.common.ssl_aug import gaussian_blur_video
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 1, 12, 12, 1)).astype(np.float32)
    out = np.asarray(gaussian_blur_video(
        jax.random.PRNGKey(3), jnp.asarray(img), img_size=110,
        p=1.0))[0, 0, :, :, 0]
    # recover the sigma the call drew
    k_apply, k_sigma = jax.random.split(jax.random.PRNGKey(3))
    sigma = float(jax.random.uniform(k_sigma, (), minval=0.1,
                                     maxval=2.0))
    radius = int(0.1 * 110) // 2 * 2 + 1
    half = radius // 2
    xs = np.arange(-half, half + 1, dtype=np.float32)
    k1 = np.exp(-0.5 * (xs / sigma) ** 2)
    k1 /= k1.sum()
    ref = img[0, 0, :, :, 0]
    ref = np.pad(ref, ((half, half), (0, 0)), mode='reflect')
    ref = np.stack([np.convolve(ref[:, j], k1[::-1], mode='valid')
                    for j in range(ref.shape[1])], axis=1)
    ref = np.pad(ref, ((0, 0), (half, half)), mode='reflect')
    ref = np.stack([np.convolve(ref[i], k1[::-1], mode='valid')
                    for i in range(ref.shape[0])], axis=0)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
