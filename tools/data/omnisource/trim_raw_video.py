#!/usr/bin/env python
"""Decompose one raw (omnisource web) video into 10-second x264 clips
under a same-named directory, then delete the raw file (parity:
reference tools/data/omnisource/trim_raw_video.py:1-45; duration via
ffprobe, list-form subprocess)."""
import os
import os.path as osp
import subprocess
import sys


def get_duration(vid_name):
    out = subprocess.check_output(
        ['ffprobe', '-v', 'error', '-show_entries', 'format=duration',
         '-of', 'default=noprint_wrappers=1:nokey=1', vid_name])
    return float(out.strip())


def trim(vid_name, clip_len=10):
    try:
        duration = get_duration(vid_name)
    except Exception:
        print(f'get_duration failed for video {vid_name}', flush=True)
        return
    dest, _ = osp.splitext(vid_name)
    os.makedirs(dest, exist_ok=True)
    i = 0
    while i * clip_len < duration:
        subprocess.call(
            ['ffmpeg', '-y', '-loglevel', 'error', '-i', vid_name,
             '-ss', str(i * clip_len), '-t', str(clip_len), '-crf',
             '18', '-c:v', 'libx264', osp.join(dest, f'part_{i}.mp4')])
        i += 1
    os.remove(vid_name)


if __name__ == '__main__':
    trim(sys.argv[1])
