"""Pose / HVU / RawVideo datasets, PK sampling order, TRN head."""
import json
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscl_tpu.datasets import (HVUDataset, NumpyLoader, PoseDataset,
                               RawVideoDataset)
from mscl_tpu.models import HEADS


class TestPoseDataset:

    def test_load_and_threshold(self, tmp_path):
        annos = []
        for v in range(6):
            annos.append(dict(
                frame_dir=f'vid_{v}', total_frames=10,
                valid_frames=v * 2, label=v % 2,
                kp=np.zeros((1, 10, 17, 2), np.float32),
                kpscore=np.ones((1, 10, 17), np.float32)))
        pkl = tmp_path / 'pose.pkl'
        pkl.write_bytes(pickle.dumps(annos))
        ds = PoseDataset(str(pkl), pipeline=[], valid_ratio=0.5)
        # valid_frames/total >= 0.5 keeps v in {3, 4, 5}
        assert len(ds) == 3


class TestHVUDataset:

    def _make(self, tmp_path):
        annos = [
            dict(frame_dir=f'v_{i}', total_frames=10,
                 label=dict(action=[i % 3], scene=[i % 2]))
            for i in range(4)
        ]
        path = tmp_path / 'hvu.json'
        path.write_text(json.dumps(annos))
        return HVUDataset(str(path), pipeline=[],
                          tag_categories=['action', 'scene'],
                          tag_category_nums=[3, 2],
                          filename_tmpl='img_{:05d}.jpg')

    def test_onehot_assembly(self, tmp_path):
        ds = self._make(tmp_path)
        sample = ds[1]
        # action tag 1 -> index 1; scene tag 1 -> offset 3 + 1 = 4
        np.testing.assert_array_equal(sample['label'],
                                      [0, 1, 0, 0, 1])
        sample0 = ds[0]
        np.testing.assert_array_equal(sample0['label'],
                                      [1, 0, 0, 1, 0])

    def test_per_category_map(self, tmp_path):
        ds = self._make(tmp_path)
        results = []
        for info in ds.video_infos:
            r = np.zeros(5, np.float32)
            r[info['label']['action'][0]] = 1.0
            r[3 + info['label']['scene'][0]] = 1.0
            results.append(r)
        out = ds.evaluate(results)
        assert out['action_mAP'] == pytest.approx(1.0)
        assert out['scene_mAP'] == pytest.approx(1.0)


class TestRawVideoDataset:

    def test_positive_sampling(self, tmp_path):
        ann = tmp_path / 'rawvideo.txt'
        ann.write_text('videoA 3 5 0 2\nvideoB 1 4\n')
        ds = RawVideoDataset(str(ann), pipeline=[],
                             sampling_strategy='positive')
        assert len(ds) == 1   # videoB has no positive clips
        np.random.seed(0)
        import random as _r
        _r.seed(0)
        s = ds[0]
        assert s['filename'].endswith(('part_0.mp4', 'part_2.mp4'))
        assert s['label'] == 3


class TestPKOrder:

    def test_groups_share_class(self):
        class DS:
            video_infos = [dict(label=i % 3) for i in range(12)]

            def __len__(self):
                return 12

            def __getitem__(self, i):
                return dict(idx=i)

        loader = NumpyLoader(DS(), batch_size=4, shuffle=True, seed=0,
                             sampler=dict(type='PKDistributedSampler',
                                          pk_sample_num=2))
        it = iter(loader)
        order = it.order
        it.close()
        assert len(order) == 24   # 12 anchors x 2
        labels = [DS.video_infos[i]['label'] for i in order]
        for a in range(0, 24, 2):
            assert labels[a] == labels[a + 1]
            assert order[a] != order[a + 1]


class TestTRNHead:

    def test_multiscale_and_simple(self):
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(8, 3, 3, 64)), jnp.float32)
        for rel in ('TRNMultiScale', 'TRN'):
            h = HEADS.get('TRNHead')(num_classes=5, in_channels=64,
                                     num_segments=4, relation_type=rel,
                                     dropout_ratio=0.0)
            v = h.init({'params': jax.random.PRNGKey(0),
                        'dropout': jax.random.PRNGKey(1)}, x, train=True)
            out = h.apply(v, x, train=True,
                          rngs={'dropout': jax.random.PRNGKey(2)})
            assert out.shape == (2, 5)
            assert np.isfinite(np.asarray(out)).all()
            # eval is deterministic (all relations of subsampled scales
            # replaced by the first n_sub)
            o1 = h.apply(v, x, train=False)
            o2 = h.apply(v, x, train=False)
            np.testing.assert_array_equal(np.asarray(o1),
                                          np.asarray(o2))


class TestProcessPoolLoader:
    """Multi-process host decode (workers_mode='process'): forked
    decode workers, ordered batch emission, clean shutdown, and error
    propagation. Equivalent of torch DataLoader num_workers>0
    (reference datasets/builder.py workers_per_gpu + worker seeding)."""

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            if i == 99:
                raise ValueError('boom')
            return dict(imgs=np.full((2, 2), i, np.float32), label=i)

    def test_batches_in_order_and_complete(self):
        loader = NumpyLoader(self.DS(), batch_size=3, shuffle=False,
                             num_workers=2, workers_mode='process',
                             drop_last=False)
        try:
            batches = list(iter(loader))
            assert len(batches) == 4
            seen = np.concatenate([b['label'] for b in batches])
            np.testing.assert_array_equal(seen, np.arange(10))
            np.testing.assert_array_equal(
                batches[1]['imgs'][:, 0, 0], [3, 4, 5])
            # second epoch reuses the pool
            loader.set_epoch(1)
            assert len(list(iter(loader))) == 4
        finally:
            loader.shutdown()
        assert loader._pool is None

    def test_worker_error_propagates(self):
        class Bad(self.DS):
            def __getitem__(self, i):
                if i == 4:
                    raise ValueError('boom')
                return super().__getitem__(i)

        loader = NumpyLoader(Bad(), batch_size=5, shuffle=False,
                             num_workers=2, workers_mode='process')
        try:
            with pytest.raises(RuntimeError, match='boom'):
                list(iter(loader))
        finally:
            loader.shutdown()

    def test_route_result_requeues_newer_generation(self):
        """ADVICE r2: a lingering (closing) epoch's producer that pops a
        NEWER epoch's result must re-queue it, not drop it — dropping
        loses the batch and hangs the new epoch's in-order emit loop.
        Older-generation leftovers are dropped; same-generation results
        land in pending."""
        import queue as _q
        from mscl_tpu.datasets.loader import _route_result
        rq = _q.Queue()
        pending = {}
        rq.put((5, 0, 'newer'))          # future epoch's result
        _route_result(rq, 4, pending, timeout=0.01)
        assert pending == {} and rq.get_nowait() == (5, 0, 'newer')
        rq.put((3, 0, 'stale'))          # abandoned epoch's leftover
        _route_result(rq, 4, pending, timeout=0.01)
        assert pending == {} and rq.empty()
        rq.put((4, 2, 'mine'))           # this epoch's result
        _route_result(rq, 4, pending, timeout=0.01)
        assert pending == {2: 'mine'} and rq.empty()

    def test_forkserver_context(self):
        """mp_context='forkserver' works with a picklable dataset
        (ADVICE r2: fork-from-threads hazard mitigation)."""
        loader = NumpyLoader(self.DS(), batch_size=5, shuffle=False,
                             num_workers=1, workers_mode='process',
                             mp_context='forkserver')
        try:
            batches = list(iter(loader))
            assert len(batches) == 2
            seen = np.concatenate([b['label'] for b in batches])
            np.testing.assert_array_equal(seen, np.arange(10))
        finally:
            loader.shutdown()

    def test_abandoned_epoch_leftovers_discarded(self):
        """Results of an abandoned epoch must not leak into the next
        (generation-tagged tasks)."""
        loader = NumpyLoader(self.DS(), batch_size=2, shuffle=True,
                             seed=7, num_workers=2,
                             workers_mode='process')
        try:
            it0 = iter(loader)
            next(it0)            # consume one batch, abandon the rest
            it0.close()
            loader.set_epoch(1)
            it1 = iter(loader)
            got = np.concatenate([b['label'] for b in it1])
            expected = np.random.default_rng(7 + 1).permutation(10)
            # epoch-1 order must be reproduced exactly, in order
            np.testing.assert_array_equal(got, expected)
        finally:
            loader.shutdown()
