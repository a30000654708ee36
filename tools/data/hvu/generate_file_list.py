#!/usr/bin/env python
"""Build the HVU multi-category annotation json from the raw CSV
(parity: reference tools/data/hvu/generate_file_list.py:1-152).

Each CSV row `tags|...,youtube_id,start,end` becomes
`<id>_<start*10:06d>_<end*10:06d>` with a per-category label dict of
tag indices into hvu_tags.json; rows whose video/frame dir is absent
are dropped. mode=frames also records total_frames (counted with the
same img_/flow_x_/flow_y_ prefix convention as the reference's
parse_directory, incl. the flow x/y count consistency check).
"""
import argparse
import fnmatch
import glob
import json
import os
import os.path as osp


def parse_directory(path, rgb_prefix='img_', flow_x_prefix='flow_x_',
                    flow_y_prefix='flow_y_', level=1):
    """video id -> (frame_dir, num_rgb, num_flow) for extracted frames."""
    pattern = '*' if level == 1 else osp.join('*', '*')
    out = {}
    for frame_dir in glob.glob(osp.join(path, pattern)):
        names = os.listdir(frame_dir)
        num_rgb = len(fnmatch.filter(names, rgb_prefix + '*'))
        num_x = len(fnmatch.filter(names, flow_x_prefix + '*'))
        num_y = len(fnmatch.filter(names, flow_y_prefix + '*'))
        if num_x != num_y:
            raise ValueError(f'x/y flow count mismatch in {frame_dir}')
        key = (osp.basename(frame_dir) if level == 1 else
               osp.join(osp.basename(osp.dirname(frame_dir)),
                        osp.basename(frame_dir)))
        out[key] = (frame_dir, num_rgb, num_x)
    return out


def main():
    p = argparse.ArgumentParser(description='build file list for HVU')
    p.add_argument('--input_csv', required=True)
    p.add_argument('--src_dir', required=True,
                   help='source video / frames directory')
    p.add_argument('--output', required=True, help='output .json')
    p.add_argument('--mode', choices=['frames', 'videos'],
                   required=True)
    p.add_argument('--tag-file', default='hvu_tags.json')
    args = p.parse_args()

    with open(args.tag_file) as f:
        tag_cates = json.load(f)
    tag2category = {t: c for c, ts in tag_cates.items() for t in ts}

    if args.mode == 'videos':
        have = {x.split('.')[0] for x in os.listdir(args.src_dir)}
        frames = None
    else:
        frames = parse_directory(args.src_dir)
        have = set(frames)

    result = []
    with open(args.input_csv) as f:
        for line in f.readlines()[1:]:
            tags, youtube_id, start, end = line.strip().split(',')
            start = int(float(start) * 10)
            end = int(float(end) * 10)
            name = f'{youtube_id}_{start:06d}_{end:06d}'
            if name not in have:
                continue
            label = {}
            for tag in tags.split('|'):
                cat = tag2category[tag]
                label.setdefault(cat, []).append(
                    tag_cates[cat].index(tag))
            if args.mode == 'frames':
                result.append(dict(frame_dir=name,
                                   total_frames=frames[name][1],
                                   label=label))
            else:
                result.append(dict(filename=name + '.mp4', label=label))

    with open(args.output, 'w') as f:
        json.dump(result, f)
    print(f'wrote {len(result)} items -> {args.output}')


if __name__ == '__main__':
    main()
