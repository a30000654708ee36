#!/usr/bin/env python
"""Extract wav audio tracks from videos (parity: reference
tools/data/extract_audio.py — ffmpeg-based; kept ffmpeg-based since
audio demux is not a TPU concern)."""
import argparse
import glob
import multiprocessing as mp
import os
import os.path as osp
import subprocess


def extract(args):
    video, out_root, sample_rate = args
    name = osp.splitext(osp.basename(video))[0]
    out = osp.join(out_root, name + '.wav')
    if osp.exists(out):
        return
    cmd = ['ffmpeg', '-i', video, '-map', '0:a', '-ac', '1', '-ar',
           str(sample_rate), '-y', out, '-loglevel', 'error']
    try:
        subprocess.run(cmd, check=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f'skip {video}: {e}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('video_root')
    p.add_argument('out_root')
    p.add_argument('--ext', default='mp4')
    p.add_argument('--sample-rate', type=int, default=16000)
    p.add_argument('--num-workers', type=int, default=4)
    args = p.parse_args()
    os.makedirs(args.out_root, exist_ok=True)
    videos = glob.glob(osp.join(args.video_root, '**',
                                f'*.{args.ext}'), recursive=True)
    with mp.Pool(args.num_workers) as pool:
        pool.map(extract, [(v, args.out_root, args.sample_rate)
                           for v in videos])
    print(f'{len(videos)} videos processed -> {args.out_root}')


if __name__ == '__main__':
    main()
