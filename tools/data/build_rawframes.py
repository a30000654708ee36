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
    video_path, rel_name, out_dir, new_short, fps = args
    name = osp.splitext(rel_name)[0]
    vout = osp.join(out_dir, name)
    os.makedirs(vout, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        return (name, 0, 'open failed')
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 0
    step = max(1, round(src_fps / fps)) if fps and src_fps else 1
    i = frame_idx = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        frame_idx += 1
        if step > 1 and (frame_idx - 1) % step:
            continue
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
    parser.add_argument('--ext', default=None,
                        help='restrict to one video extension')
    parser.add_argument('--fps', type=float, default=0,
                        help='resample to this fps (0 = keep all frames)')
    args = parser.parse_args()

    exts = (f'.{args.ext.lstrip(".")}'.lower(),) if args.ext \
        else VIDEO_EXTS
    pattern = '*' if args.level == 1 else '*/*'
    videos = [p for p in glob.glob(osp.join(args.src_dir, pattern))
              if p.lower().endswith(exts)]
    print(f'found {len(videos)} videos')
    os.makedirs(args.out_dir, exist_ok=True)
    # level 2 keeps the <class>/<video> structure the file lists expect
    tasks = [(v, osp.relpath(v, args.src_dir), args.out_dir,
              args.new_short, args.fps) for v in videos]
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
