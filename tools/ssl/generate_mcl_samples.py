#!/usr/bin/env python
"""Motion Differential Sampling (MDS) sample generation.

Parity: reference tools/ssl/generate_mcl_samples.py — per video: for each
flow frame compute a weight map (Sobel motion-edge map / pooled attention
map / RGB-diff map), pool per frame, sum over a clip window
(clip_len, clip_stride), and keep the clip starts whose weight exceeds the
median as ``chosen_idx`` (:20-31 motion map, :76-134 clip weighting).
Local-file data plane: flow blobs are np4/npy paths under 'enc_flows';
results are written back into the annotation pickle.
"""
import argparse
import os.path as osp
import pickle
import sys
from multiprocessing import Pool

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(
    __file__)))))

from mscl_tpu.utils.flow_viz import flow_to_image  # noqa: E402
from mscl_tpu.utils.np4 import np4_decode  # noqa: E402


def _sobel(x, axis):
    """scipy.ndimage.sobel-equivalent (reflect boundary) without scipy:
    smooth [1,2,1] along the other axis, derivative [-1,0,1] along axis."""
    from scipy import ndimage
    return ndimage.sobel(x, axis=axis)


def cal_motion_map(flow: np.ndarray) -> np.ndarray:
    """Gradient-magnitude motion-edge map (reference :20-31)."""
    u, v = flow[..., 0], flow[..., 1]
    s = [_sobel(u, -1), _sobel(u, 0), _sobel(v, -1), _sobel(v, 0)]
    return np.sqrt(sum(np.square(g) for g in s))


def cal_attention_map(mp: np.ndarray, att_type='max') -> np.ndarray:
    """Avg-pool(28) + bilinear upsample + normalize (reference :33-46)."""
    import cv2
    sl = 28
    h, w = mp.shape
    ph, pw = max(h // sl, 1), max(w // sl, 1)
    pooled = mp[:ph * sl, :pw * sl].reshape(ph, sl, pw, sl).mean((1, 3))
    up = cv2.resize(pooled, (w, h), interpolation=cv2.INTER_LINEAR)
    if att_type == 'max':
        return up / max(up.max(), 1e-12)
    if att_type == 'sum':
        return up / max(up.sum(), 1e-12)
    raise ValueError(f'unknown att_type {att_type}')


def cal_rgb_map(flow: np.ndarray, att_type='none') -> np.ndarray:
    """Color-wheel RGB map, optionally attention-weighted
    (reference :49-62)."""
    rgb = flow_to_image(flow, convert_to_bgr=False).astype(np.float32)
    if att_type == 'none':
        return rgb
    att = cal_attention_map(cal_motion_map(flow), att_type)[..., None]
    return att * rgb


def process_single_flow(flow, weight_type, att_type='none'):
    if weight_type == 'motion_map':
        return cal_motion_map(flow)
    if weight_type == 'attention_map':
        return cal_attention_map(cal_motion_map(flow), att_type)
    if weight_type == 'rgb_map':
        return cal_rgb_map(flow, att_type)
    raise ValueError(f'unknown weight_type {weight_type}')


def _load_flow(path):
    if path.endswith('.npy'):
        return np.load(path)
    with open(path, 'rb') as f:
        return np4_decode(f.read())


def process_video(meta, weight_type='motion_map', att_type='none',
                  pool_type='avg', clip_len=8, clip_stride=4):
    """chosen_idx = clip starts whose summed weight > median
    (reference :76-134)."""
    pool_func = (lambda x: x.mean((0, 1))) if pool_type == 'avg' else \
        (lambda x: x.max((0, 1)))
    video_weights = [
        process_single_flow(_load_flow(p), weight_type, att_type)
        for p in meta['enc_flows']]

    if 'rgb' in weight_type:
        # frame differential of the RGB maps (reference :104-112)
        video_weights.append(video_weights[-1])
        video_weights = [
            np.linalg.norm(video_weights[i] - video_weights[i + 1],
                           axis=-1)
            for i in range(len(video_weights) - 1)]

    vid_len = len(video_weights)
    frame_weights = [pool_func(w) for w in video_weights]
    clip_weights = []
    for i in range(vid_len):
        cur = 0.0
        for j in range(clip_len):
            if i + j * clip_stride < vid_len:
                cur += frame_weights[i + j * clip_stride]
        clip_weights.append(cur / clip_len)

    clip_median = np.median(clip_weights)
    meta = dict(meta)
    meta['chosen_idx'] = [i for i, v in enumerate(clip_weights)
                          if v > clip_median]
    return meta


def _worker(args):
    meta, kwargs = args
    return process_video(meta, **kwargs)


def main():
    parser = argparse.ArgumentParser(description='Generate MDS chosen_idx')
    parser.add_argument('anno_pkl', help='annotation pickle (list of '
                        'dicts with enc_flows)')
    parser.add_argument('out_pkl', help='output pickle')
    parser.add_argument('--weight-type', default='motion_map',
                        choices=['motion_map', 'attention_map', 'rgb_map'])
    parser.add_argument('--att-type', default='none')
    parser.add_argument('--pool-type', default='avg',
                        choices=['avg', 'max'])
    parser.add_argument('--clip-len', type=int, default=8)
    parser.add_argument('--clip-stride', type=int, default=4)
    parser.add_argument('--num-workers', type=int, default=1)
    args = parser.parse_args()

    with open(args.anno_pkl, 'rb') as f:
        annos = pickle.load(f)
    if isinstance(annos, dict):
        annos = list(annos.values())
    kwargs = dict(weight_type=args.weight_type, att_type=args.att_type,
                  pool_type=args.pool_type, clip_len=args.clip_len,
                  clip_stride=args.clip_stride)
    if args.num_workers > 1:
        with Pool(args.num_workers) as pool:
            out = pool.map(_worker, [(m, kwargs) for m in annos])
    else:
        out = [process_video(m, **kwargs) for m in annos]
    with open(args.out_pkl, 'wb') as f:
        pickle.dump(out, f)
    n_chosen = np.mean([len(m['chosen_idx']) for m in out])
    print(f'wrote {len(out)} videos, mean chosen_idx per video: '
          f'{n_chosen:.1f}')


if __name__ == '__main__':
    main()
