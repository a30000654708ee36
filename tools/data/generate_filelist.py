#!/usr/bin/env python
"""Generate train/val/test file lists for a supported dataset from its
official annotations + an extracted frames/videos directory.

Parity: reference tools/data/build_file_list.py + per-dataset
``generate_{rawframes,videos}_filelist.sh`` wrappers, collapsed into one
CLI over the shared split parsers (tools/data/split_parsers.py).

Output formats (reference build_file_list.py lines_to_list):
  rawframes: "<frame_dir> <total_frames> <label...>"
  videos:    "<video_path> <label...>"

Example:
  python tools/data/generate_filelist.py ucf101 \
      --anno-dir data/ucf101/annotations \
      --src-dir data/ucf101/rawframes --format rawframes --level 2 \
      --out-dir data/ucf101
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(__file__))
from parse_file_list import parse_directory        # noqa: E402
from split_parsers import PARSERS                  # noqa: E402

SPLIT_NAMES = {2: ('train', 'val'), 3: ('train', 'val', 'test')}


def format_line(video, label, fmt, frame_dict, ext):
    if isinstance(label, (list, tuple)):
        label_str = ' '.join(str(x) for x in label)
    else:
        label_str = str(label)
    if fmt == 'videos':
        return f'{video}.{ext} {label_str}'
    if video not in frame_dict:
        return None
    _, n_rgb, _ = frame_dict[video]
    return f'{video} {n_rgb} {label_str}'


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('dataset', choices=sorted(PARSERS))
    p.add_argument('--anno-dir', required=True,
                   help='official annotation directory')
    p.add_argument('--src-dir', required=True,
                   help='rawframes root (or videos root for videos fmt)')
    p.add_argument('--format', default='rawframes',
                   choices=['rawframes', 'videos'])
    p.add_argument('--level', type=int, default=2, choices=[1, 2])
    p.add_argument('--ext', default='mp4', help='video extension')
    p.add_argument('--out-dir', default='.')
    p.add_argument('--rgb-prefix', default='img_')
    args = p.parse_args()

    splits = PARSERS[args.dataset](args.anno_dir, level=args.level)
    frame_dict = {}
    if args.format == 'rawframes':
        frame_dict = parse_directory(args.src_dir, level=args.level,
                                     rgb_prefix=args.rgb_prefix)

    os.makedirs(args.out_dir, exist_ok=True)
    for split_idx, group in enumerate(splits):
        names = SPLIT_NAMES.get(len(group)) or \
            tuple(f's{i}' for i in range(len(group)))
        for name, items in zip(names, group):
            suffix = f'_split_{split_idx + 1}' if len(splits) > 1 else ''
            out = osp.join(
                args.out_dir,
                f'{args.dataset}_{name}{suffix}_'
                f'{args.format}.txt')
            lines, missing = [], 0
            for video, label in items:
                line = format_line(video, label, args.format,
                                   frame_dict, args.ext)
                if line is None:
                    missing += 1
                else:
                    lines.append(line)
            with open(out, 'w') as f:
                f.write('\n'.join(lines) + ('\n' if lines else ''))
            note = f' ({missing} missing from src-dir)' if missing else ''
            print(f'wrote {len(lines):6d} entries to {out}{note}')


if __name__ == '__main__':
    main()
