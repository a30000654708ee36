"""Registry-surface parity: the round-2 audit components (reid/distill
heads, TwoR5/ResNet3dLayer backbones, triplet/weighted-CE losses,
untrimmed/proposal/HVU/image transforms, image/audio-visual datasets)
construct and run. Reference files cited per class docstring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscl_tpu.models.builder import build_backbone, build_head, build_loss


class TestNewHeads:

    def test_tsm_head3d_multi_clf(self):
        h = build_head(dict(type='TSMHead3D', num_classes=5,
                            in_channels=16, num_segments=4, num_clfs=2))
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(8, 7, 7, 16)), jnp.float32)
        v = h.init(jax.random.PRNGKey(0), x)
        assert h.apply(v, x).shape == (2, 5)

    def test_reid_head_losses(self):
        h = build_head(dict(type='TSMReidSimpleHead', num_classes=5,
                            in_channels=16, num_segments=4,
                            loss_cls=dict(type='CrossEntropyLoss')))
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(8, 7, 7, 16)), jnp.float32)
        v = h.init(jax.random.PRNGKey(0), x)
        s, aux = h.apply(v, x, mutable=['intermediates', 'batch_stats'])
        feat = aux['intermediates']['reid_feat'][0]
        losses = h.loss(s, jnp.asarray([0, 1]), reid_feat=feat)
        assert set(losses) >= {'loss_cls', 'loss_reid', 'top1_acc'}

    def test_fg_reid_cosface(self):
        h = build_head(dict(type='FGTSMReidSimpleHead', num_classes=5,
                            in_channels=16, num_segments=4,
                            dropout_ratio=0.0,
                            use_cosface=dict(use=True, s=8, m=0.2)))
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(8, 7, 7, 16)), jnp.float32)
        labels = jnp.asarray([0, 1])
        v = h.init(jax.random.PRNGKey(0), x, train=True, labels=labels)
        infer = h.apply(v, x, train=False)
        train = h.apply(v, x, train=True, labels=labels,
                        rngs={'dropout': jax.random.PRNGKey(1)})
        # margin subtracts s*m from the target-class logit only
        diff = np.asarray(infer - train)
        target = diff[np.arange(2), np.asarray(labels)]
        np.testing.assert_allclose(target, 8 * 0.2, atol=1e-4)
        off = diff[np.arange(2), (np.asarray(labels) + 1) % 5]
        np.testing.assert_allclose(off, 0.0, atol=1e-4)

    def test_recognizer2d_wires_reid_head(self):
        """ADVICE r2: Recognizer2D must plumb labels into reid heads (so
        the cosface margin is live in training) and feed the pooled
        reid_feat into loss() (so loss_reid is actually computed)."""
        from mscl_tpu.models import build_model
        model = build_model(dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=18, in_channels=3),
            cls_head=dict(type='TSMReidSimpleHead', num_classes=5,
                          in_channels=512, num_segments=2,
                          dropout_ratio=0.0,
                          use_cosface=dict(use=True, s=8, m=0.2),
                          loss_cls=dict(type='CrossEntropyLoss'))))
        imgs = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 2, 3, 32, 32)), jnp.float32)
        labels = jnp.asarray([0, 1])
        v = model.init(jax.random.PRNGKey(0), imgs, labels, train=True)
        losses, _ = model.apply(
            v, imgs, labels, train=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(1)})
        assert 'loss_reid' in losses     # triplet reid branch is live
        # cosface margin live: same weights, labels shifted -> the margin
        # lands on different logits -> loss_cls changes
        losses2, _ = model.apply(
            v, imgs, jnp.asarray([2, 3]), train=True,
            mutable=['batch_stats'], rngs={'dropout': jax.random.PRNGKey(1)})
        assert abs(float(losses['loss_cls']) -
                   float(losses2['loss_cls'])) > 1e-6

    def test_rc_modist_head(self):
        h = build_head(dict(type='RcMoDistHead', dim_fpn=8))
        mlvl = [jnp.ones((2, 4, 8, 8, 8)), jnp.ones((2, 4, 4, 4, 8))]
        flow_q = jnp.ones((2, 8, 32, 32, 3))
        v = h.init(jax.random.PRNGKey(0), mlvl, flow_q)
        out = h.apply(v, mlvl, flow_q)
        assert float(out['rc_loss']) >= 0
        assert h.loss_mx(out['rc_loss'])['loss_rc'] is out['rc_loss']


class TestNewBackbones:

    def test_resnet3d_layer(self):
        m = build_backbone(dict(type='ResNet3dLayer', depth=18, stage=3,
                                pretrained=None))
        x = jnp.zeros((1, 4, 7, 7, 256))
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x, mutable=['batch_stats'])[0]
        assert y.shape == (1, 4, 4, 4, 512)

    def test_slowonly_two_r5(self):
        m = build_backbone(dict(type='ResNet3dSlowOnly_TwoR5', depth=18,
                                pretrained=None, base_channels=8))
        x = jnp.zeros((1, 4, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        g, l = m.apply(v, x, mutable=['batch_stats'])[0]
        assert g.shape == l.shape
        # independent final-stage weights
        p = v['params']
        assert 'layer4_0' in p and 'layer4_0_local' in p


class TestNewLosses:

    def test_triplet_batch_hard(self):
        loss = build_loss(dict(type='TripletLoss', margin=0.3))
        feat = jnp.asarray([[0., 0.], [0.1, 0.], [5., 5.], [5.1, 5.]])
        labels = jnp.asarray([0, 0, 1, 1])
        # clusters are far apart: loss hits the zero hinge
        assert float(loss(feat, labels)) == 0.0
        mixed = jnp.asarray([[0., 0.], [5., 5.], [0.1, 0.], [5.1, 5.]])
        labels2 = jnp.asarray([0, 0, 1, 1])
        assert float(loss(mixed, labels2)) > 0.0

    def test_weighted_ce(self):
        loss = build_loss(dict(type='WeightedCrossEntropyLoss_torch'))
        score = jnp.asarray([[2., 0.], [0., 2.]])
        labels = jnp.asarray([0, 1])
        w_equal = loss(score, labels, pool_weight=jnp.asarray([1., 1.]))
        w_first = loss(score, labels, pool_weight=jnp.asarray([1., 0.]))
        np.testing.assert_allclose(float(w_equal), float(w_first),
                                   rtol=1e-4)


class TestNewTransforms:

    def test_untrimmed_sample_frames(self):
        from mscl_tpu.datasets.builder import PIPELINES
        t = PIPELINES.module_dict['UntrimmedSampleFrames'](
            clip_len=4, frame_interval=16)
        r = t(dict(total_frames=64, start_index=0))
        assert r['num_clips'] == 4
        assert len(r['frame_inds']) == 16
        assert r['frame_inds'].min() >= 0
        assert r['frame_inds'].max() <= 63

    def test_load_hvu_label(self):
        from mscl_tpu.datasets.builder import PIPELINES
        t = PIPELINES.module_dict['LoadHVULabel']()
        r = t(dict(categories=['action', 'scene'],
                   category_nums=[3, 2],
                   label=dict(action=[0, 2], scene=[1])))
        np.testing.assert_array_equal(r['label'], [1, 0, 1, 0, 1])
        np.testing.assert_array_equal(r['mask'], [1, 1, 1, 1, 1])
        np.testing.assert_array_equal(r['category_mask'], [1, 1])

    def test_build_pseudo_clip(self):
        from mscl_tpu.datasets.builder import PIPELINES
        t = PIPELINES.module_dict['BuildPseudoClip'](clip_len=3)
        img = np.zeros((4, 4, 3), np.uint8)
        r = t(dict(imgs=[img]))
        assert len(r['imgs']) == 3
        assert r['imgs'][0] is not r['imgs'][1]

    def test_multi_group_crop(self):
        from mscl_tpu.datasets.builder import PIPELINES
        t = PIPELINES.module_dict['MultiGroupCrop'](crop_size=8,
                                                    groups=3)
        imgs = [np.zeros((16, 16, 3), np.uint8)] * 2
        r = t(dict(imgs=imgs))
        assert len(r['imgs']) == 6
        assert r['img_shape'] == (8, 8)

    def test_load_proposals(self, tmp_path):
        from mscl_tpu.datasets.builder import PIPELINES
        (tmp_path / 'v1.csv').write_text(
            'tmin,tmax,tmin_score,tmax_score,score,match_iou\n'
            '0.1,0.5,0.9,0.8,0.7,0.6\n0.2,0.6,0.8,0.7,0.6,0.5\n')
        np.save(tmp_path / 'v1.npy',
                np.zeros((2, 32), np.float32))
        t = PIPELINES.module_dict['LoadProposals'](
            top_k=2, pgm_proposals_dir=str(tmp_path),
            pgm_features_dir=str(tmp_path))
        r = t(dict(video_name='v1'))
        np.testing.assert_allclose(r['tmin'], [0.1, 0.2])
        np.testing.assert_allclose(r['reference_temporal_iou'],
                                   [0.6, 0.5])
        assert r['bsp_feature'].shape == (2, 32)


class TestNewDatasets:

    def test_image_dataset(self, tmp_path):
        import cv2
        from mscl_tpu.datasets import build_dataset
        img_path = tmp_path / 'im1.jpg'
        cv2.imwrite(str(img_path),
                    np.zeros((8, 8, 3), np.uint8))
        ann = tmp_path / 'ann.txt'
        ann.write_text(f'{img_path} 1\n')
        ds = build_dataset(dict(
            type='ImageDataset', ann_file=str(ann),
            pipeline=[dict(type='ImageDecode')]))
        s = ds[0]
        assert s['imgs'][0].shape == (8, 8, 3)
        assert s['label'] == 1

    def test_audio_visual_dataset(self, tmp_path):
        from mscl_tpu.datasets import build_dataset
        ann = tmp_path / 'ann.txt'
        ann.write_text('vid_a 16 2\n')
        ds = build_dataset(dict(
            type='AudioVisualDataset', ann_file=str(ann),
            audio_prefix=str(tmp_path / 'audio'),
            video_prefix=str(tmp_path / 'videos'),
            data_prefix=str(tmp_path / 'frames'), pipeline=[]))
        info = ds.video_infos[0]
        assert info['audio_path'].endswith('audio/vid_a.npy')
        assert info['filename'].endswith('videos/vid_a.mp4')
        assert info['total_frames'] == 16


class TestModuleHooks:
    """OutputHook (capture_intermediates-backed) + GPUNormalize
    pre-forward hooks (reference core/hooks/output.py,
    utils/module_hooks.py)."""

    def test_output_hook_captures_named_layer(self):
        from flax import linen as nn
        from mscl_tpu.utils.module_hooks import OutputHook

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Dense(4, name='backbone')(x)
                return nn.Dense(2, name='head')(x)

        m = Tiny()
        v = m.init(jax.random.PRNGKey(0), jnp.ones((3, 5)))
        with OutputHook(m, v, outputs=['backbone', 'head']) as h:
            out = h.apply(jnp.ones((3, 5)))
        assert out.shape == (3, 2)
        assert h.layer_outputs['backbone'].shape == (3, 4)
        np.testing.assert_allclose(h.layer_outputs['head'], out,
                                   rtol=1e-6)

    def test_gpu_normalize_hook(self):
        from mscl_tpu.utils.module_hooks import register_module_hooks
        fn = register_module_hooks(
            lambda x: x,
            [dict(type='GPUNormalize', input_format='NCTHW',
                  mean=[2., 2., 2.], std=[4., 4., 4.])])
        y = fn(jnp.full((1, 3, 2, 4, 4), 6.0))
        np.testing.assert_allclose(np.asarray(y), 1.0)


class TestMetricUtils:
    """Small reference metric utilities (accuracy.py:91-127, 429-455)."""

    def test_top_k_classes(self):
        from mscl_tpu.core.evaluation import top_k_classes
        scores = np.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4],
                           [0.3, 0.7]])
        labels = np.array([0, 1, 1, 1])
        top = top_k_classes(scores, labels, k=2)
        assert top[0] == (0, 1.0)
        assert top[1][0] == 1 and abs(top[1][1] - 2 / 3) < 1e-9
        worst = top_k_classes(scores, labels, k=1, mode='inaccurate')
        assert worst[0][0] == 1

    def test_get_weighted_score(self):
        from mscl_tpu.core.evaluation import get_weighted_score
        s1 = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
        s2 = [np.array([0.0, 2.0]), np.array([2.0, 0.0])]
        out = get_weighted_score([s1, s2], [1.0, 0.5])
        np.testing.assert_allclose(out[0], [1.0, 1.0])
        np.testing.assert_allclose(out[1], [1.0, 1.0])
