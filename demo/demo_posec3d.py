#!/usr/bin/env python
"""Skeleton-based action recognition demo (parity: reference
demo/demo_posec3d.py — the reference extracts poses with mmdet+mmpose;
here poses arrive precomputed as a pickle with keypoint /
keypoint_score arrays, the format of PoseDataset annotations)."""
import argparse
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mscl_tpu import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description='posec3d demo')
    parser.add_argument('config')
    parser.add_argument('checkpoint', help="checkpoint path or ''")
    parser.add_argument('pose_pkl',
                        help='dict with keypoint (M, T, K, 2), '
                             'keypoint_score (M, T, K), img_shape')
    parser.add_argument('label', nargs='?', default=None)
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        default={})
    args = parser.parse_args()

    import jax.numpy as jnp
    from mscl_tpu.apis.inference import init_recognizer
    from mscl_tpu.datasets.builder import PIPELINES
    from mscl_tpu.registry import build_from_cfg

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    with open(args.pose_pkl, 'rb') as f:
        anno = pickle.load(f)
    results = dict(anno)
    results.setdefault('total_frames', anno['keypoint'].shape[1])
    results.setdefault('start_index', 0)
    results.setdefault('label', -1)
    results.setdefault('modality', 'Pose')

    model, variables, cfg = init_recognizer(cfg,
                                            args.checkpoint or None)
    pipeline_cfg = dict(cfg.data['test' if 'test' in cfg.data else
                                 'val'])['pipeline']
    for tcfg in pipeline_cfg:
        results = build_from_cfg(dict(tcfg), PIPELINES)(results)
    imgs = jnp.asarray(np.asarray(results['imgs'])[None])
    scores = np.asarray(model.apply(variables, imgs,
                                    return_loss=False))[0]
    names = None
    if args.label:
        with open(args.label) as f:
            names = [ln.strip() for ln in f]
    top5 = sorted(enumerate(scores.tolist()), key=lambda kv: -kv[1])[:5]
    print('The top-5 labels with corresponding scores are:')
    for clsidx, score in top5:
        print(f'{names[clsidx] if names else clsidx}: {score:.4f}')


if __name__ == '__main__':
    main()
