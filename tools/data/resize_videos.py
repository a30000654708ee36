#!/usr/bin/env python
"""Resize videos with ffmpeg (parity: reference
tools/data/resize_videos.py — short-side scaling for dataset prep)."""
import argparse
import glob
import multiprocessing as mp
import os
import os.path as osp
import subprocess


def resize(task):
    video, out_root, scale, dense, level = task
    parts = video.split('/')
    name = '/'.join(parts[-level:])
    out = osp.join(out_root, name)
    os.makedirs(osp.dirname(out), exist_ok=True)
    if osp.exists(out):
        return
    vf = (f"scale='if(gt(iw,ih),-2,{scale})':"
          f"'if(gt(iw,ih),{scale},-2)'")
    cmd = ['ffmpeg', '-i', video, '-vf', vf, '-c:v', 'libx264']
    if dense:
        cmd += ['-g', '16']
    cmd += ['-an', '-y', out, '-loglevel', 'error']
    try:
        subprocess.run(cmd, check=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f'skip {video}: {e}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src_root')
    p.add_argument('out_root')
    p.add_argument('--ext', default='mp4')
    p.add_argument('--scale', type=int, default=256,
                   help='short side after resize')
    p.add_argument('--dense', action='store_true',
                   help='small keyframe interval for fast seeking')
    p.add_argument('--level', type=int, default=1)
    p.add_argument('--num-workers', type=int, default=4)
    args = p.parse_args()
    videos = glob.glob(osp.join(args.src_root, '**',
                                f'*.{args.ext}'), recursive=True)
    with mp.Pool(args.num_workers) as pool:
        pool.map(resize, [(v, args.out_root, args.scale, args.dense,
                           args.level) for v in videos])
    print(f'{len(videos)} videos -> {args.out_root}')


if __name__ == '__main__':
    main()
