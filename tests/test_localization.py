"""BMN localizer + proposal utils tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
