#!/usr/bin/env python
"""Merge per-video RGB + flow clip features into fixed-length (100 x
400) BSN/BMN input features (parity: reference
tools/data/activitynet/activitynet_feature_postprocessing.py:1-99; the
scipy interp1d is replaced with an equivalent pure-numpy linear
interpolation — same sampling grid, same mean/max bin pooling).
"""
import argparse
import multiprocessing
import os
import os.path as osp
import pickle

import numpy as np

ARGS = None


def _interp_rows(data, xs):
    """Linear interpolation of data (T, D) at positions xs (M,) along
    axis 0 — the interp1d(x_range, data, axis=0) equivalent."""
    xs = np.asarray(xs)
    lo = np.clip(np.floor(xs).astype(int), 0, len(data) - 1)
    hi = np.clip(lo + 1, 0, len(data) - 1)
    frac = (xs - lo)[:, None]
    return data[lo] * (1 - frac) + data[hi] * frac


def pool_feature(data, num_proposals=100, num_sample_bins=3,
                 pool_type='mean'):
    """Resample an arbitrary-length (T, D) feature to (num_proposals, D):
    num_sample_bins interpolated points per anchor, mean/max pooled."""
    data = np.asarray(data, dtype=np.float64)
    if len(data) == 1:
        return np.concatenate([data] * num_proposals)
    eps = 1e-4
    start, end = eps, len(data) - 1 - eps
    anchor = (end - start) / num_proposals
    feature = []
    ptr = start
    for _ in range(num_proposals):
        xs = [ptr + i / num_sample_bins * anchor
              for i in range(num_sample_bins)]
        ys = _interp_rows(data, xs)
        feature.append(ys.mean(axis=0) if pool_type == 'mean'
                       else ys.max(axis=0))
        ptr += anchor
    return np.stack(feature)


def merge_feat(name):
    with open(osp.join(ARGS.rgb, name), 'rb') as f:
        rgb = pickle.load(f)
    with open(osp.join(ARGS.flow, name), 'rb') as f:
        flow = pickle.load(f)
    feat = np.concatenate([pool_feature(rgb), pool_feature(flow)],
                          axis=-1)
    os.makedirs(ARGS.dest, exist_ok=True)
    if ARGS.output_format == 'pkl':
        with open(osp.join(ARGS.dest, name), 'wb') as f:
            pickle.dump(feat, f)
    else:
        lines = [','.join(f'f{i}' for i in range(feat.shape[1]))]
        lines += [','.join(f'{x:.4f}' for x in row) for row in feat]
        out = osp.join(ARGS.dest, name.replace('.pkl', '.csv'))
        with open(out, 'w') as f:
            f.write('\n'.join(lines))


def main():
    global ARGS
    p = argparse.ArgumentParser(description='ANet feature prepare')
    p.add_argument('--rgb', default='', help='rgb feature root')
    p.add_argument('--flow', default='', help='flow feature root')
    p.add_argument('--dest', default='', help='dest root')
    p.add_argument('--output-format', default='csv',
                   choices=['csv', 'pkl'])
    p.add_argument('--workers', type=int, default=8)
    ARGS = p.parse_args()
    rgb, flow = set(os.listdir(ARGS.rgb)), set(os.listdir(ARGS.flow))
    assert rgb == flow, 'rgb / flow feature sets differ'
    with multiprocessing.Pool(ARGS.workers) as pool:
        pool.map(merge_feat, sorted(rgb))


if __name__ == '__main__':
    main()
