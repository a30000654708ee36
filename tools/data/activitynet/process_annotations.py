#!/usr/bin/env python
"""Split the ActivityNet annotation database into per-subset localizer
annotation files (parity: reference
tools/data/activitynet/process_annotations.py:1-54 — same outputs, but
CLI-parameterized paths instead of hardcoded relative roots).

Inputs: the BSN-style `video_info_new.csv` (name, numFrame, seconds,
fps, rfps, subset, ...) and `anet_anno_action.json`. Outputs
anet_anno_{train,val,test,full}.json with fps/rfps merged into each
video's record — the format our ActivityNetDataset consumes.
"""
import argparse
import csv
import json
import os.path as osp


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data-root', default='data/ActivityNet')
    p.add_argument('--info-file', default=None,
                   help='default <data-root>/video_info_new.csv')
    p.add_argument('--ann-file', default=None,
                   help='default <data-root>/anet_anno_action.json')
    args = p.parse_args()
    info_file = args.info_file or osp.join(args.data_root,
                                           'video_info_new.csv')
    ann_file = args.ann_file or osp.join(args.data_root,
                                         'anet_anno_action.json')

    with open(ann_file) as f:
        anno_database = json.load(f)

    subsets = {'training': {}, 'validation': {}, 'testing': {}}
    full = {}
    with open(info_file) as f:
        reader = csv.reader(f)
        next(reader)  # header
        n = 0
        for row in reader:
            n += 1
            name, subset = row[0], row[5]
            info = anno_database[name]
            info['fps'] = float(row[3])
            info['rfps'] = float(row[4])
            full[name] = info
            if subset in subsets:
                subsets[subset][name] = info

    print(f'full subset video numbers: {n}')
    out = {'train': subsets['training'], 'val': subsets['validation'],
           'test': subsets['testing'], 'full': full}
    for tag, d in out.items():
        path = osp.join(args.data_root, f'anet_anno_{tag}.json')
        with open(path, 'w') as f:
            json.dump(d, f)
        print(f'wrote {len(d)} videos -> {path}')


if __name__ == '__main__':
    main()
