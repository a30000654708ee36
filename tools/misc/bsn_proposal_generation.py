#!/usr/bin/env python
"""BSN proposal-generation (PGM) driver.

Parity: reference tools/misc/bsn_proposal_generation.py:14-195 —
after training the TEM and dumping per-video csv results, generate
candidate proposals and BSP features for PEM training/testing.

Usage:
  python tools/misc/bsn_proposal_generation.py ANN_FILE \
      --tem-results-dir DIR --pgm-proposals-dir DIR \
      --pgm-features-dir DIR --temporal-scale 100 --peak-threshold 0.5
"""
import argparse
import json
import multiprocessing as mp
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mscl_tpu.localization import (generate_bsp_feature,  # noqa: E402
                                   generate_candidate_proposals)


def load_video_infos(ann_file):
    with open(ann_file) as f:
        anno = json.load(f)
    return [dict(video_name=name, **info) for name, info in anno.items()]


def main():
    p = argparse.ArgumentParser(description='BSN PGM')
    p.add_argument('ann_file')
    p.add_argument('--tem-results-dir', required=True)
    p.add_argument('--pgm-proposals-dir', required=True)
    p.add_argument('--pgm-features-dir', required=True)
    p.add_argument('--temporal-scale', type=int, default=100)
    p.add_argument('--peak-threshold', type=float, default=0.5)
    p.add_argument('--top-k', type=int, default=1000)
    p.add_argument('--num-workers', type=int, default=1)
    args = p.parse_args()

    video_infos = load_video_infos(args.ann_file)
    ids = list(range(len(video_infos)))
    os.makedirs(args.pgm_proposals_dir, exist_ok=True)
    os.makedirs(args.pgm_features_dir, exist_ok=True)

    def shard(worker):
        return ids[worker::args.num_workers]

    def run(worker):
        props = generate_candidate_proposals(
            shard(worker), video_infos, args.tem_results_dir,
            args.temporal_scale, args.peak_threshold)
        header = 'tmin,tmax,tmin_score,tmax_score,score,match_iou,match_ioa'
        for name, arr in props.items():
            np.savetxt(osp.join(args.pgm_proposals_dir, name + '.csv'),
                       arr, delimiter=',', header=header, comments='')
        feats = generate_bsp_feature(
            shard(worker), video_infos, args.tem_results_dir,
            args.pgm_proposals_dir, top_k=args.top_k)
        for name, arr in feats.items():
            np.save(osp.join(args.pgm_features_dir, name + '.npy'), arr)

    if args.num_workers > 1:
        with mp.Pool(args.num_workers) as pool:
            pool.map(run, range(args.num_workers))
    else:
        run(0)
    print(f'PGM done: {len(video_infos)} videos -> '
          f'{args.pgm_proposals_dir}, {args.pgm_features_dir}')


if __name__ == '__main__':
    main()
