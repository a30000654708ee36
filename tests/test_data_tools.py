"""Round-4 data-prep tool tests: ActivityNet BSN/BMN prep, HVU / gym
file-list generators, NTU detection post-processing (reference
tools/data/* behaviors re-implemented TPU-host-native)."""
import json
import os
import runpy
import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit('/tests', 1)[0])

from tools.data.activitynet.feature_postprocessing import pool_feature
from tools.data.activitynet.convert_proposal_format import \
    segment_iou_and_overlap
from tools.data.skeleton.ntu_pose_extraction import (
    build_tracklets, easy_example, ntu_det_postproc,
    remove_duplicate_boxes)


class TestPoolFeature:

    def test_matches_scipy_interp1d(self):
        scipy = pytest.importorskip('scipy.interpolate')
        rng = np.random.default_rng(0)
        data = rng.normal(size=(37, 5))
        ours = pool_feature(data, num_proposals=10, num_sample_bins=3)
        # reference formulation (activitynet_feature_postprocessing.py
        # :24-64) via scipy
        f = scipy.interp1d(list(range(len(data))), data, axis=0)
        eps = 1e-4
        start, end = eps, len(data) - 1 - eps
        anchor = (end - start) / 10
        ptr, ref = start, []
        for _ in range(10):
            xs = [ptr + i / 3 * anchor for i in range(3)]
            ref.append(f(xs).mean(axis=0))
            ptr += anchor
        np.testing.assert_allclose(ours, np.stack(ref), rtol=1e-10)

    def test_single_row_broadcast(self):
        out = pool_feature(np.ones((1, 4)), num_proposals=7)
        assert out.shape == (7, 4)

    def test_max_pool(self):
        data = np.arange(20, dtype=float)[:, None]
        mean = pool_feature(data, num_proposals=5, pool_type='mean')
        mx = pool_feature(data, num_proposals=5, pool_type='max')
        assert np.all(mx >= mean)


class TestProposalFormat:

    def test_iou_and_overlap(self):
        props = np.array([[0., 10.], [5., 15.]])
        gts = np.array([[0., 10.]])
        iou, overlap = segment_iou_and_overlap(props, gts)
        assert iou.shape == (1, 2)
        np.testing.assert_allclose(iou[0], [1.0, 5. / 15.])
        np.testing.assert_allclose(overlap[0], [1.0, 0.5])


class TestNtuPostproc:

    def _boxes(self, x0, score=0.99):
        return np.array([[x0, 100., x0 + 200., 400., score]])

    def test_removedup_keeps_dominant(self):
        big = [0., 0., 100., 100., 0.9]
        inner = [10., 10., 90., 90., 0.5]
        out = remove_duplicate_boxes(np.array([big, inner]))
        assert out.shape == (1, 5)
        np.testing.assert_allclose(out[0], big)

    def test_easy_example(self):
        dets = [self._boxes(10.), self._boxes(12.), self._boxes(14.)]
        ok, boxes = easy_example(dets, 1)
        assert ok and boxes.shape == (3, 1, 5)
        ok2, _ = easy_example(dets, 2)
        assert not ok2

    def test_tracklets_associate_by_iou(self):
        # one person drifting right: a single tracklet
        dets = [self._boxes(10. + 3 * t) for t in range(8)]
        tracks = build_tracklets(dets)
        assert len(tracks) == 1
        assert len(tracks[0]) == 8
        # a far-away second person forms its own tracklet
        dets2 = [np.concatenate([self._boxes(10.),
                                 self._boxes(1000., 0.8)])
                 for _ in range(8)]
        assert len(build_tracklets(dets2)) == 2

    def test_postproc_single_person_video(self):
        # A001 = single-person class; noisy low-score extra box present
        dets = []
        for t in range(12):
            person = self._boxes(200. + 2 * t, 0.99)
            noise = np.array([[0., 0., 30., 30., 0.2]])
            dets.append(np.concatenate([person, noise]))
        out = ntu_det_postproc('S001C001P001R001A001.avi', dets)
        assert out.shape[0] == 12
        # every frame ends with a confident person box
        box_rows = out.reshape(12, -1, 5) if out.ndim == 3 else \
            out[:, None]
        assert np.all(box_rows[:, 0, -1] > 0.9)

    def test_postproc_two_person_video(self):
        # A050 = mutual action: two clean people -> easy path, 2 boxes
        dets = [np.concatenate([self._boxes(100.),
                                self._boxes(700.)]) for _ in range(6)]
        out = ntu_det_postproc('S001C001P001R001A050.avi', dets)
        assert out.shape == (6, 2, 5)


class TestFileListScripts:

    def test_activitynet_process_annotations(self, tmp_path):
        anno = {'v_a': {'annotations': [], 'duration': 10.0},
                'v_b': {'annotations': [], 'duration': 20.0}}
        (tmp_path / 'anet_anno_action.json').write_text(json.dumps(anno))
        (tmp_path / 'video_info_new.csv').write_text(
            'video,numFrame,seconds,fps,rfps,subset,featureFrame\n'
            'v_a,300,10.0,30.0,30.0,training,300\n'
            'v_b,600,20.0,30.0,29.7,validation,600\n')
        argv = sys.argv
        sys.argv = ['process_annotations.py', '--data-root',
                    str(tmp_path)]
        try:
            runpy.run_path(
                'tools/data/activitynet/process_annotations.py',
                run_name='__main__')
        finally:
            sys.argv = argv
        train = json.loads((tmp_path / 'anet_anno_train.json')
                           .read_text())
        val = json.loads((tmp_path / 'anet_anno_val.json').read_text())
        assert set(train) == {'v_a'} and set(val) == {'v_b'}
        assert train['v_a']['fps'] == 30.0 and val['v_b']['rfps'] == 29.7

    def test_hvu_tag_list_and_sub_list(self, tmp_path):
        csv = tmp_path / 'hvu_categories.csv'
        csv.write_text('Tag,Category\nrun,action\ndog,object\n'
                       'jump,action\n')
        out = tmp_path / 'hvu_tags.json'
        argv = sys.argv
        sys.argv = ['parse_tag_list.py', '--tag-list', str(csv),
                    '--output', str(out)]
        try:
            runpy.run_path('tools/data/hvu/parse_tag_list.py',
                           run_name='__main__')
        finally:
            sys.argv = argv
        tags = json.loads(out.read_text())
        assert tags == {'action': ['jump', 'run'], 'object': ['dog']}

        ann = tmp_path / 'hvu_train.json'
        ann.write_text(json.dumps([
            {'filename': 'x.mp4', 'label': {'action': [0]}},
            {'filename': 'y.mp4', 'label': {'object': [0]}},
        ]))
        sys.argv = ['generate_sub_file_list.py', str(ann), 'action']
        try:
            runpy.run_path('tools/data/hvu/generate_sub_file_list.py',
                           run_name='__main__')
        finally:
            sys.argv = argv
        sub = json.loads((tmp_path / 'hvu_action_train.json')
                         .read_text())
        # the reference's own bug (dumping the unfiltered list) is fixed:
        # only action-labeled items remain, label flattened
        assert sub == [{'filename': 'x.mp4', 'label': [0]}]

    def test_gym_file_list(self, tmp_path):
        anno = tmp_path / 'annotations'
        anno.mkdir()
        (tmp_path / 'subactions').mkdir()
        for n in ('vid1_E1_S1', 'vid2_E1_S1'):
            (tmp_path / 'subactions' / f'{n}.mp4').write_text('')
        (anno / 'gym99_train_org.txt').write_text(
            'vid1_E1_S1 3\nmissing_E1_S1 5\n')
        (anno / 'gym99_val_org.txt').write_text('vid2_E1_S1 7\n')
        argv = sys.argv
        sys.argv = ['generate_file_list.py', '--data-root',
                    str(tmp_path)]
        try:
            runpy.run_path('tools/data/gym/generate_file_list.py',
                           run_name='__main__')
        finally:
            sys.argv = argv
        assert (anno / 'gym99_train.txt').read_text() == \
            'vid1_E1_S1.mp4 3'
        assert (anno / 'gym99_val.txt').read_text() == 'vid2_E1_S1.mp4 7'

    def test_hvu_generate_file_list_videos(self, tmp_path):
        (tmp_path / 'videos').mkdir()
        (tmp_path / 'videos' / 'abc_000010_000050.mp4').write_text('')
        csv = tmp_path / 'in.csv'
        csv.write_text('Tags,youtube_id,time_start,time_end\n'
                       'run|dog,abc,1.0,5.0\n'
                       'jump,zzz,0.0,2.0\n')
        tags = tmp_path / 'hvu_tags.json'
        tags.write_text(json.dumps(
            {'action': ['jump', 'run'], 'object': ['dog']}))
        out = tmp_path / 'out.json'
        argv = sys.argv
        sys.argv = ['generate_file_list.py', '--input_csv', str(csv),
                    '--src_dir', str(tmp_path / 'videos'),
                    '--output', str(out), '--mode', 'videos',
                    '--tag-file', str(tags)]
        try:
            runpy.run_path('tools/data/hvu/generate_file_list.py',
                           run_name='__main__')
        finally:
            sys.argv = argv
        items = json.loads(out.read_text())
        assert items == [{'filename': 'abc_000010_000050.mp4',
                          'label': {'action': [1], 'object': [0]}}]
