#!/usr/bin/env python
"""Build FineGym(99) train/val file lists from the org annotation lists,
keeping only downloaded subaction clips; also emits rawframe lists
(num_frames = files // 3: img + flow_x + flow_y) when the frame root
exists (parity: reference tools/data/gym/generate_file_list.py:1-49)."""
import argparse
import os
import os.path as osp


def convert(org_file, videos, out_file, frame_root, frame_file):
    with open(org_file) as f:
        rows = [x.strip().split() for x in f]
    rows = [x for x in rows if x[0] + '.mp4' in videos]
    if frame_root and osp.exists(frame_root):
        lines = []
        for name, label in rows:
            n = len(os.listdir(osp.join(frame_root, name)))
            lines.append(f'{name} {n // 3} {label}')
        with open(frame_file, 'w') as f:
            f.write('\n'.join(lines))
        print(f'wrote {len(lines)} -> {frame_file}')
    with open(out_file, 'w') as f:
        f.write('\n'.join(f'{name}.mp4 {label}' for name, label in rows))
    print(f'wrote {len(rows)} -> {out_file}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data-root', default='data/gym')
    p.add_argument('--subset', default='gym99')
    args = p.parse_args()
    anno = osp.join(args.data_root, 'annotations')
    videos = set(os.listdir(osp.join(args.data_root, 'subactions')))
    frame_root = osp.join(args.data_root, 'subaction_frames')
    for split in ('train', 'val'):
        convert(osp.join(anno, f'{args.subset}_{split}_org.txt'), videos,
                osp.join(anno, f'{args.subset}_{split}.txt'), frame_root,
                osp.join(anno, f'{args.subset}_{split}_frame.txt'))


if __name__ == '__main__':
    main()
