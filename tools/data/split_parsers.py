#!/usr/bin/env python
"""Official-annotation split parsers for the supported datasets.

Parity: reference tools/data/parse_file_list.py:84-540 (behavioral —
same split/label semantics for each dataset's official annotation
format), re-written with explicit ``anno_dir`` arguments instead of the
reference's hardcoded ``data/<ds>/annotations`` paths.

Every parser returns ``splits``: a tuple of split-groups, each group a
tuple of lists of ``(video, label)`` pairs (label: int, list of ints
for multi-label datasets, or the raw class path for ucf101 level 1).
"""
from __future__ import annotations

import csv
import json
import os.path as osp
from typing import List, Tuple


def _strip_ext(name: str) -> str:
    return osp.splitext(name)[0]


def parse_ucf101_splits(anno_dir: str, level: int = 2):
    """classInd.txt + trainlist0{1-3}.txt / testlist0{1-3}.txt."""
    with open(osp.join(anno_dir, 'classInd.txt')) as f:
        class_mapping = {}
        for line in f:
            idx, name = line.strip().split()
            class_mapping[name] = int(idx) - 1

    def line_to_map(line):
        path = line.strip().split()[0]
        video = _strip_ext(path)
        if level == 1:
            return osp.basename(video), path
        return video, class_mapping[osp.dirname(path)]

    splits = []
    for i in (1, 2, 3):
        with open(osp.join(anno_dir, f'trainlist{i:02d}.txt')) as f:
            train = [line_to_map(x) for x in f if x.strip()]
        with open(osp.join(anno_dir, f'testlist{i:02d}.txt')) as f:
            test = [line_to_map(x) for x in f if x.strip()]
        splits.append((train, test))
    return tuple(splits)


def parse_hmdb51_splits(anno_dir: str, level: int = 2):
    """Per-class ``<cls>_test_split{1-3}.txt`` files; tag 1 = train,
    2 = test, 0 = unused. Labels are sorted class names."""
    import glob
    classes = sorted({
        osp.basename(p).rsplit('_test_split', 1)[0]
        for p in glob.glob(osp.join(anno_dir, '*_test_split1.txt'))
    })
    class_mapping = {c: i for i, c in enumerate(classes)}

    splits = []
    for i in (1, 2, 3):
        train, test = [], []
        for cls in classes:
            with open(osp.join(anno_dir,
                               f'{cls}_test_split{i}.txt')) as f:
                for line in f:
                    if not line.strip():
                        continue
                    name, tag = line.strip().split()[:2]
                    video = _strip_ext(name)
                    if level == 2:
                        video = osp.join(cls, video)
                    pair = (video, class_mapping[cls])
                    if tag == '1':
                        train.append(pair)
                    elif tag == '2':
                        test.append(pair)
        splits.append((train, test))
    return tuple(splits)


def _parse_semicolon_csv(anno_dir, label_file, split_files, level,
                         strip_template=False):
    """sthv1/jester style: ``<id>;<label name>`` lines + a labels csv
    with one class name per line."""
    with open(osp.join(anno_dir, label_file)) as f:
        classes = [line.strip() for line in f if line.strip()]
    class_mapping = {c: i for i, c in enumerate(classes)}

    out = []
    for fname in split_files:
        items = []
        with open(osp.join(anno_dir, fname)) as f:
            for line in f:
                if not line.strip():
                    continue
                parts = line.strip().split(';')
                video = parts[0]
                if level == 2:
                    video = osp.join(video[:2], video)
                if len(parts) > 1:
                    name = parts[1]
                    if strip_template:
                        name = name.replace('[', '').replace(']', '')
                    items.append((video, class_mapping[name]))
                else:
                    items.append((video, -1))   # unlabeled test split
        out.append(items)
    return (tuple(out),)


def parse_jester_splits(anno_dir: str, level: int = 1):
    return _parse_semicolon_csv(
        anno_dir, 'jester-v1-labels.csv',
        ['jester-v1-train.csv', 'jester-v1-validation.csv',
         'jester-v1-test.csv'], level)


def parse_sthv1_splits(anno_dir: str, level: int = 1):
    return _parse_semicolon_csv(
        anno_dir, 'something-something-v1-labels.csv',
        ['something-something-v1-train.csv',
         'something-something-v1-validation.csv',
         'something-something-v1-test.csv'], level,
        strip_template=True)


def parse_sthv2_splits(anno_dir: str, level: int = 1):
    """v2 json annotations: [{'id', 'template', ...}] + labels json
    {template: index}."""
    with open(osp.join(anno_dir,
                       'something-something-v2-labels.json')) as f:
        class_mapping = {k: int(v) for k, v in json.load(f).items()}

    def load(fname, labeled=True):
        with open(osp.join(anno_dir, fname)) as f:
            data = json.load(f)
        items = []
        for item in data:
            video = str(item['id'])
            if level == 2:
                video = osp.join(video[:2], video)
            if labeled:
                template = item['template'].replace(
                    '[', '').replace(']', '')
                items.append((video, class_mapping[template]))
            else:
                items.append((video, -1))
        return items

    return ((load('something-something-v2-train.json'),
             load('something-something-v2-validation.json'),
             load('something-something-v2-test.json', labeled=False)),)


def parse_kinetics_splits(anno_dir: str, dataset: str = 'kinetics400',
                          level: int = 2):
    """ActivityNet-crawler csvs: label,youtube_id,time_start,time_end,
    split[,is_cc]; video dirs are ``{id}_{start:06d}_{end:06d}``."""

    def norm_label(s, keep_ws=False):
        s = s.strip().strip('"')
        return s if keep_ws else s.replace(' ', '_')

    with open(osp.join(anno_dir, f'{dataset}_train.csv')) as f:
        rows = list(csv.DictReader(f))
    classes = sorted({norm_label(r['label']) for r in rows})
    class_mapping = {c: i for i, c in enumerate(classes)}

    def parse_csv(fname, labeled=True):
        items = []
        with open(osp.join(anno_dir, fname)) as f:
            for r in csv.DictReader(f):
                vid = (f"{r['youtube_id']}_"
                       f"{int(float(r['time_start'])):06d}_"
                       f"{int(float(r['time_end'])):06d}")
                if labeled:
                    label = class_mapping[norm_label(r['label'])]
                    video = osp.join(norm_label(r['label']), vid) \
                        if level == 2 else vid
                    items.append((video, label))
                else:
                    items.append((vid, -1))
        return items

    train = parse_csv(f'{dataset}_train.csv')
    val = parse_csv(f'{dataset}_val.csv')
    try:
        test = parse_csv(f'{dataset}_test.csv', labeled=False)
    except FileNotFoundError:
        test = []
    return ((train, val, test),)


def parse_mit_splits(anno_dir: str):
    """moments_categories.txt (``name,index``) + trainingSet /
    validationSet csvs with ``<cls>/<video>`` first column."""
    class_mapping = {}
    with open(osp.join(anno_dir, 'moments_categories.txt')) as f:
        for line in f:
            if line.strip():
                name, idx = line.strip().split(',')
                class_mapping[name] = int(idx)

    def parse(fname):
        items = []
        with open(osp.join(anno_dir, fname)) as f:
            for row in csv.reader(f):
                video = _strip_ext(row[0])
                items.append((video, class_mapping[osp.dirname(row[0])]))
        return items

    train = parse('trainingSet.csv')
    val = parse('validationSet.csv')
    return ((train, val, val),)


def parse_mmit_splits(anno_dir: str):
    """Multi-label: csv rows ``<video>,<label idx>...``."""

    def parse(fname):
        items = []
        with open(osp.join(anno_dir, fname)) as f:
            for row in csv.reader(f):
                items.append((_strip_ext(row[0]),
                              [int(x) for x in row[1:]]))
        return items

    train = parse('trainingSet.csv')
    val = parse('validationSet.csv')
    return ((train, val, val),)


def parse_diving48_splits(anno_dir: str):
    """Diving48_V2_{train,test}.json: [{'vid_name', 'label', ...}]."""

    def parse(fname):
        with open(osp.join(anno_dir, fname)) as f:
            return [(item['vid_name'], item['label'])
                    for item in json.load(f)]

    return ((parse('Diving48_V2_train.json'),
             parse('Diving48_V2_test.json')),)


PARSERS = {
    'ucf101': parse_ucf101_splits,
    'hmdb51': parse_hmdb51_splits,
    'jester': parse_jester_splits,
    'sthv1': parse_sthv1_splits,
    'sthv2': parse_sthv2_splits,
    'kinetics400': lambda d, level=2: parse_kinetics_splits(
        d, 'kinetics400', level),
    'kinetics600': lambda d, level=2: parse_kinetics_splits(
        d, 'kinetics600', level),
    'kinetics700': lambda d, level=2: parse_kinetics_splits(
        d, 'kinetics700', level),
    'mit': lambda d, level=1: parse_mit_splits(d),
    'mmit': lambda d, level=1: parse_mmit_splits(d),
    'diving48': lambda d, level=1: parse_diving48_splits(d),
}
