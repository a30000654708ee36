#!/usr/bin/env python
"""RAFT flow + flow-derived bbox smoke/visualization CLI.

Parity: reference tools/vis_flow.py — a script that fetches one video's
frames, runs RAFT flow inference at the extraction geometry
(gap, adjacent), visualizes the flows, and derives per-frame motion
bboxes (RAFT.inference_flows / inference_bboxs). The reference reads
Megvii nori/OSS; this version reads a local frame directory (the
repo-wide data-plane redesign) and uses the flax RAFT + flow_bbox
utilities.

Usage:
  python tools/vis_flow.py <frame_dir> [--weights raft.pth]
      [--gap 8] [--adjacent 8] [--out-dir vis_flow_out]
"""
import argparse
import glob
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('frame_dir', help='directory of video frames (jpg/png)')
    p.add_argument('--weights', default='',
                   help='torch RAFT checkpoint (.pth); random init if '
                        'empty (smoke mode)')
    p.add_argument('--gap', type=int, default=8,
                   help='stride between flow frames')
    p.add_argument('--adjacent', type=int, default=8,
                   help='frame offset of each flow pair')
    p.add_argument('--iters', type=int, default=12)
    p.add_argument('--out-dir', default='vis_flow_out')
    p.add_argument('--no-bbox', action='store_true')
    p.add_argument('--resize', type=int, nargs=2, default=None,
                   metavar=('W', 'H'),
                   help='resize frames before inference (RAFT needs '
                        '>=64px after the 1/8 encoder for its 4-level '
                        'pyramid)')
    args = p.parse_args()

    import cv2
    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)),
                                'misc'))
    from flow_extraction import make_raft_fn
    from mscl_tpu.flow.flow_bbox import inference_bboxs
    from mscl_tpu.utils.flow_viz import flow_to_image

    paths = sorted(glob.glob(osp.join(args.frame_dir, '*.jpg')) +
                   glob.glob(osp.join(args.frame_dir, '*.png')))
    assert paths, f'no frames under {args.frame_dir}'
    frames = []
    for f in paths:
        im = cv2.imread(f)
        if im is None:
            sys.exit(f'unreadable image: {f}')
        frames.append(im[..., ::-1].astype(np.float32))
    if args.resize:
        frames = [cv2.resize(f, tuple(args.resize)) for f in frames]
    n = len(frames)
    idx1 = list(range(0, max(n - args.adjacent, 1), args.gap))
    idx2 = [min(i + args.adjacent, n - 1) for i in idx1]
    print(f'{n} frames -> {len(idx1)} flow pairs '
          f'(gap={args.gap}, adjacent={args.adjacent})')

    raft_fn = make_raft_fn(args.weights or None, iters=args.iters)
    st = time.time()
    img1 = np.stack([frames[i] for i in idx1])
    img2 = np.stack([frames[i] for i in idx2])
    flows = np.asarray(raft_fn(img1, img2))
    print(f'RAFT inference: {time.time() - st:.2f}s, '
          f'flow shape {flows.shape}, '
          f'max {flows.max():.2f} min {flows.min():.2f} '
          f'mean {flows.mean():.4f}')

    os.makedirs(args.out_dir, exist_ok=True)
    for k, fl in enumerate(flows):
        vis = flow_to_image(fl)
        cv2.imwrite(osp.join(args.out_dir, f'flow_{k:04d}.jpg'),
                    vis[..., ::-1])
    print(f'wrote {len(flows)} flow visualizations to {args.out_dir}')

    if not args.no_bbox:
        boxes, picked, stats = inference_bboxs(
            n, list(flows), gap=args.gap, adjacent=args.adjacent)
        np.save(osp.join(args.out_dir, 'bboxes.npy'),
                np.asarray(boxes, dtype=object), allow_pickle=True)
        freq_dict, found_freq, picked_freq, aver_vary, corner = stats
        print(f'{len(boxes)} smoothed bboxes ({len(picked)} picked, '
              f'found_freq={found_freq:.3f} picked_freq='
              f'{picked_freq:.3f} corner_freq={corner:.3f}) -> '
              f'{args.out_dir}/bboxes.npy')


if __name__ == '__main__':
    main()
