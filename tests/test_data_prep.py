"""Data-prep tooling: split parsers + file-list generation against
synthetic official-format annotation fixtures (parity: reference
tools/data/parse_file_list.py:84-540, build_file_list.py)."""
import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
import pytest

TOOLS = osp.join(osp.dirname(__file__), '..', 'tools', 'data')
sys.path.insert(0, TOOLS)

from split_parsers import (PARSERS, parse_diving48_splits,   # noqa: E402
                           parse_hmdb51_splits, parse_kinetics_splits,
                           parse_sthv2_splits, parse_ucf101_splits)


@pytest.fixture
def ucf_anno(tmp_path):
    d = tmp_path / 'anno'
    d.mkdir()
    (d / 'classInd.txt').write_text(
        '1 ApplyEyeMakeup\n2 Archery\n')
    for i in (1, 2, 3):
        (d / f'trainlist{i:02d}.txt').write_text(
            'ApplyEyeMakeup/v_A_g01_c01.avi 1\n'
            'Archery/v_B_g01_c01.avi 2\n')
        (d / f'testlist{i:02d}.txt').write_text(
            'Archery/v_B_g02_c02.avi\n')
    return str(d)


class TestSplitParsers:

    def test_ucf101(self, ucf_anno):
        splits = parse_ucf101_splits(ucf_anno, level=2)
        assert len(splits) == 3
        train, test = splits[0]
        assert ('ApplyEyeMakeup/v_A_g01_c01', 0) in train
        assert ('Archery/v_B_g01_c01', 1) in train
        assert test == [('Archery/v_B_g02_c02', 1)]

    def test_hmdb51(self, tmp_path):
        d = tmp_path / 'anno'
        d.mkdir()
        for i in (1, 2, 3):
            (d / f'brush_hair_test_split{i}.txt').write_text(
                'clip_a.avi 1 \nclip_b.avi 2 \nclip_c.avi 0 \n')
            (d / f'walk_test_split{i}.txt').write_text(
                'clip_d.avi 1 \n')
        splits = parse_hmdb51_splits(str(d), level=2)
        assert len(splits) == 3
        train, test = splits[0]
        assert ('brush_hair/clip_a', 0) in train
        assert ('walk/clip_d', 1) in train
        assert test == [('brush_hair/clip_b', 0)]

    def test_kinetics(self, tmp_path):
        d = tmp_path / 'anno'
        d.mkdir()
        head = 'label,youtube_id,time_start,time_end,split\n'
        (d / 'kinetics400_train.csv').write_text(
            head + '"abseiling",xxYY,10,20,train\n'
            'zumba,zzAA,5,15,train\n')
        (d / 'kinetics400_val.csv').write_text(
            head + 'zumba,qqBB,0,10,val\n')
        splits = parse_kinetics_splits(str(d), 'kinetics400', level=2)
        (train, val, test), = splits
        assert ('abseiling/xxYY_000010_000020', 0) in train
        assert val == [('zumba/qqBB_000000_000010', 1)]
        assert test == []

    def test_sthv2(self, tmp_path):
        d = tmp_path / 'anno'
        d.mkdir()
        (d / 'something-something-v2-labels.json').write_text(
            json.dumps({'Doing something': 0, 'Other thing': 1}))
        (d / 'something-something-v2-train.json').write_text(json.dumps(
            [dict(id=101, template='Doing [something]')]))
        (d / 'something-something-v2-validation.json').write_text(
            json.dumps([dict(id=102, template='Other thing')]))
        (d / 'something-something-v2-test.json').write_text(
            json.dumps([dict(id=103)]))
        (train, val, test), = parse_sthv2_splits(str(d), level=1)
        assert train == [('101', 0)]
        assert val == [('102', 1)]
        assert test == [('103', -1)]

    def test_diving48(self, tmp_path):
        d = tmp_path / 'anno'
        d.mkdir()
        (d / 'Diving48_V2_train.json').write_text(json.dumps(
            [dict(vid_name='v1', label=7)]))
        (d / 'Diving48_V2_test.json').write_text(json.dumps(
            [dict(vid_name='v2', label=3)]))
        (train, test), = parse_diving48_splits(str(d))
        assert train == [('v1', 7)] and test == [('v2', 3)]

    def test_all_parsers_registered(self):
        for name in ('ucf101', 'hmdb51', 'jester', 'sthv1', 'sthv2',
                     'kinetics400', 'kinetics600', 'kinetics700',
                     'mit', 'mmit', 'diving48'):
            assert name in PARSERS


class TestGenerateFilelist:

    def test_rawframes_end_to_end(self, ucf_anno, tmp_path):
        frames = tmp_path / 'rawframes'
        for vid, n in [('ApplyEyeMakeup/v_A_g01_c01', 12),
                       ('Archery/v_B_g01_c01', 8),
                       ('Archery/v_B_g02_c02', 6)]:
            vd = frames / vid
            vd.mkdir(parents=True)
            for i in range(n):
                (vd / f'img_{i + 1:05d}.jpg').write_bytes(b'')
        out = tmp_path / 'out'
        r = subprocess.run(
            [sys.executable, osp.join(TOOLS, 'generate_filelist.py'),
             'ucf101', '--anno-dir', ucf_anno, '--src-dir', str(frames),
             '--format', 'rawframes', '--level', '2',
             '--out-dir', str(out)],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        train = (out / 'ucf101_train_split_1_rawframes.txt').read_text()
        assert 'ApplyEyeMakeup/v_A_g01_c01 12 0' in train
        assert 'Archery/v_B_g01_c01 8 1' in train
        test = (out / 'ucf101_val_split_1_rawframes.txt').read_text()
        assert test.strip() == 'Archery/v_B_g02_c02 6 1'


def test_visualize_samples_cli(tmp_path):
    """tools/misc/visualize_samples.py (the local-file equivalent of the
    reference's nori-bound tools/misc/visualize.py + vis_flow.py)."""
    import pickle
    import subprocess
    import sys

    import cv2
    import numpy as np

    from mscl_tpu.utils.np4 import np4_encode
    root = tmp_path / 'data'
    root.mkdir()
    rng = np.random.default_rng(0)
    annos = []
    for v in range(2):
        vdir = root / f'v{v}'
        vdir.mkdir()
        frames, flows = [], []
        for i in range(8):
            p = str(vdir / f'img_{i:05d}.jpg')
            cv2.imwrite(p, rng.integers(0, 256, (32, 48, 3),
                                        dtype=np.uint8))
            frames.append(p)
        for i in range(3):
            p = str(vdir / f'flow_{i:05d}.np4')
            with open(p, 'wb') as f:
                f.write(np4_encode(
                    rng.normal(size=(32, 48, 2)).astype(np.float32)))
            flows.append(p)
        annos.append(dict(frames=frames, enc_flows=flows, label=v))
    pkl = tmp_path / 'train.pkl'
    with open(pkl, 'wb') as f:
        pickle.dump(annos, f)
    out_dir = tmp_path / 'viz'
    res = subprocess.run(
        [sys.executable,
         osp.join(REPO, 'tools/misc/visualize_samples.py'), str(pkl),
         str(out_dir), '--num-videos', '2', '--frames-per-video', '2'],
        capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stdout + res.stderr
    sheets = list(out_dir.glob('*.jpg'))
    assert len(sheets) == 2
    img = cv2.imread(str(sheets[0]))
    assert img is not None and img.shape[1] == 48 * 3   # 3 panels
