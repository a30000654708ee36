#!/usr/bin/env python
"""Synthesize videos from rawframe directories with ffmpeg.

Parity: reference tools/data/build_videos.py (same CLI surface —
src_dir/out_dir, --fps/--level/--start-idx/--filename-tmpl/--in-format/
--ext/--vcodec/--num-worker); re-implemented around subprocess instead
of os.system string interpolation.
"""
import argparse
import glob
import os
import os.path as osp
import subprocess
import sys
from multiprocessing import Pool


def encode_video(item):
    full_path, frame_dir_path, frame_dir_id, args = item
    img_path = osp.join(full_path,
                        args.filename_tmpl + '.' + args.in_format)
    out_vid_path = osp.join(args.out_dir,
                            frame_dir_path + '.' + args.ext)
    os.makedirs(osp.dirname(out_vid_path), exist_ok=True)
    cmd = ['ffmpeg', '-y', '-start_number', str(args.start_idx),
           '-r', str(args.fps), '-i', img_path,
           '-vcodec', args.vcodec, out_vid_path]
    try:
        res = subprocess.run(cmd, capture_output=True)
        ok = res.returncode == 0
    except FileNotFoundError:
        print('ffmpeg not found on PATH', file=sys.stderr)
        return False
    print(f'{frame_dir_id} {frame_dir_path} '
          f'{"done" if ok else "FAILED"}')
    sys.stdout.flush()
    return ok


def parse_args():
    parser = argparse.ArgumentParser(description='synthesize videos')
    parser.add_argument('src_dir', help='source rawframe directory')
    parser.add_argument('out_dir', help='output video directory')
    parser.add_argument('--fps', type=int, default=30)
    parser.add_argument('--level', type=int, choices=[1, 2], default=2,
                        help='directory level of data')
    parser.add_argument('--num-worker', type=int, default=8)
    parser.add_argument('--in-format', default='jpg',
                        choices=['jpg', 'png'])
    parser.add_argument('--start-idx', type=int, default=0)
    parser.add_argument('--filename-tmpl', default='img_%05d')
    parser.add_argument('--vcodec', default='mpeg4')
    parser.add_argument('--ext', default='mp4',
                        choices=['mp4', 'avi'])
    parser.add_argument('--resume', action='store_true',
                        help='skip dirs whose output video exists')
    return parser.parse_args()


def main():
    args = parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    pattern = '*/*' if args.level == 2 else '*'
    frame_dirs = sorted(
        d for d in glob.glob(osp.join(args.src_dir, pattern))
        if osp.isdir(d))
    items = []
    for i, full_path in enumerate(frame_dirs):
        rel = osp.relpath(full_path, args.src_dir)
        if args.resume and osp.exists(
                osp.join(args.out_dir, rel + '.' + args.ext)):
            continue
        items.append((full_path, rel, i, args))
    print(f'{len(items)} rawframe directories to encode')
    with Pool(args.num_worker) as pool:
        results = pool.map(encode_video, items)
    print(f'{sum(bool(r) for r in results)}/{len(items)} succeeded')


if __name__ == '__main__':
    main()
