#!/usr/bin/env python
"""Extract frames from videos (parity: tools/data/build_rawframes.py).

Decodes every video under src_dir into per-video frame directories with
cv2 (multi-process over videos), optionally short-side resized.
"""
import argparse
import glob
import os
import os.path as osp
from multiprocessing import Pool

import cv2

VIDEO_EXTS = ('.mp4', '.avi', '.mkv', '.webm', '.mov')


def extract_one(args):
    video_path, out_dir, new_short, report_every = args
    name = osp.splitext(osp.basename(video_path))[0]
    vout = osp.join(out_dir, name)
    os.makedirs(vout, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        return (name, 0, 'open failed')
    i = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        if new_short:
            h, w = frame.shape[:2]
            scale = new_short / min(h, w)
            if scale < 1.0 or scale > 1.0:
                frame = cv2.resize(frame, (int(w * scale + 0.5),
                                           int(h * scale + 0.5)))
        cv2.imwrite(osp.join(vout, f'img_{i + 1:05d}.jpg'), frame)
        i += 1
    cap.release()
    return (name, i, 'ok')


def main():
    parser = argparse.ArgumentParser(description='Extract rawframes')
    parser.add_argument('src_dir')
    parser.add_argument('out_dir')
    parser.add_argument('--level', type=int, default=1, choices=[1, 2],
                        help='video dir nesting level')
    parser.add_argument('--new-short', type=int, default=0,
                        help='resize short side (0 = keep)')
    parser.add_argument('--num-workers', type=int, default=1)
    args = parser.parse_args()

    pattern = '*' if args.level == 1 else '*/*'
    videos = [p for p in glob.glob(osp.join(args.src_dir, pattern))
              if p.lower().endswith(VIDEO_EXTS)]
    print(f'found {len(videos)} videos')
    os.makedirs(args.out_dir, exist_ok=True)
    tasks = [(v, args.out_dir, args.new_short, 50) for v in videos]
    if args.num_workers > 1:
        with Pool(args.num_workers) as pool:
            results = pool.map(extract_one, tasks)
    else:
        results = [extract_one(t) for t in tasks]
    ok = sum(1 for _, n, s in results if s == 'ok' and n > 0)
    print(f'done: {ok}/{len(videos)} extracted')
    for name, n, status in results:
        if status != 'ok' or n == 0:
            print(f'FAILED: {name} ({status}, {n} frames)')


if __name__ == '__main__':
    main()
