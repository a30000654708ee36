#!/usr/bin/env python
"""Visualize MDS/MSCL samples: frames + flow color images + motion
pseudo-boxes, side by side.

Parity role: reference tools/misc/visualize.py (424 lines of
nori/OSS/rrun plumbing around flow_to_image + corner-bbox stats) and
tools/vis_flow.py — rebuilt for the local-file data plane: reads a
FileRawframeDataset-format pkl (dict(frames=[jpg paths],
enc_flows=[np4 paths], ...)), renders each sampled frame next to its
flow visualization with the flow->bbox pseudo-box overlaid, and writes
per-video contact sheets.

    python tools/misc/visualize_samples.py train.pkl out_dir \
        --num-videos 4 --frames-per-video 6
"""
import argparse
import os
import os.path as osp
import pickle
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mscl_tpu.flow.flow_bbox import flow_to_bbox  # noqa: E402
from mscl_tpu.utils.flow_viz import flow_to_image  # noqa: E402
from mscl_tpu.utils.np4 import np4_decode  # noqa: E402


def render_video(anno, num_frames):
    frames = anno['frames']
    flows = anno.get('enc_flows', [])
    take = np.linspace(0, max(len(flows) - 1, 0),
                       num=min(num_frames, max(len(flows), 1)),
                       dtype=int)
    rows = []
    for fi in take:
        with open(flows[fi], 'rb') as f:
            flow = np4_decode(f.read())
        if flow is None:
            continue
        img = cv2.imread(frames[min(fi * 2, len(frames) - 1)])
        h, w = flow.shape[:2]
        img = cv2.resize(img, (w, h))
        viz = flow_to_image(flow)[..., ::-1]    # RGB -> BGR for cv2
        boxed = viz.copy()
        for box in flow_to_bbox(flow):          # candidate motion boxes
            x1, y1, x2, y2 = (int(v) for v in box)
            cv2.rectangle(boxed, (x1, y1), (x2, y2), (0, 255, 0), 1)
        rows.append(np.concatenate([img, viz, boxed], axis=1))
    return np.concatenate(rows, axis=0) if rows else None


def main():
    p = argparse.ArgumentParser()
    p.add_argument('pkl')
    p.add_argument('out_dir')
    p.add_argument('--num-videos', type=int, default=4)
    p.add_argument('--frames-per-video', type=int, default=6)
    args = p.parse_args()
    with open(args.pkl, 'rb') as f:
        annos = pickle.load(f)
    os.makedirs(args.out_dir, exist_ok=True)
    written = 0
    for v, anno in enumerate(annos[:args.num_videos]):
        sheet = render_video(anno, args.frames_per_video)
        if sheet is None:
            continue
        out = osp.join(args.out_dir, f'video_{v:04d}.jpg')
        cv2.imwrite(out, sheet)
        written += 1
        print(f'wrote {out} ({sheet.shape[1]}x{sheet.shape[0]})')
    print(f'{written} contact sheets in {args.out_dir}')


if __name__ == '__main__':
    main()
