#!/usr/bin/env python
"""Clip-level feature extraction (parity: reference
tools/misc/clip_feature_extraction.py): run the recognizer's pooled
feature path over a test dataset and dump per-video features."""
import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mscl_tpu import Config, DictAction  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', help="checkpoint path or ''")
    p.add_argument('--out', default='features.npz')
    p.add_argument('--num-devices', type=int, default=None)
    p.add_argument('--cfg-options', nargs='+', action=DictAction,
                   default={})
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    from flax import serialization
    from mscl_tpu.apis.inference import extract_features
    from mscl_tpu.apis.train import build_model_from_cfg
    from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                               init_state, load_checkpoint, restore_model_state)
    from mscl_tpu.datasets import build_dataloader, build_dataset
    from mscl_tpu.parallel.mesh import create_mesh

    ds_cfg = dict(cfg.data['test' if 'test' in cfg.data else 'val'])
    ds_cfg['test_mode'] = True
    dataset = build_dataset(ds_cfg)
    mesh = create_mesh(args.num_devices)
    n_dev = len(mesh.devices.flatten())
    loader = build_dataloader(dataset,
                              cfg.data.get('videos_per_gpu', 1),
                              num_gpus=n_dev, shuffle=False)

    model_cfg = {k: v for k, v in dict(cfg.model).items()
                 if k != 'train_cfg'}
    model = build_model_from_cfg(model_cfg)
    sample = dataset[0]
    batch = {'imgs': np.asarray(sample['imgs'])[None],
             'label': np.zeros((1,), np.int64)}
    lr = build_lr_schedule(dict(policy='fixed'), 0.0, 1, 1)
    tx = build_optimizer(dict(type='SGD', lr=0.0), lr)
    state = init_state(model, tx, batch)
    if args.checkpoint:
        ckpt = load_checkpoint(args.checkpoint)
        state = restore_model_state(state, ckpt)

    feats = extract_features(model, state, loader, mesh)
    labels = np.asarray([info.get('label', -1)
                         for info in dataset.video_infos])
    np.savez(args.out, features=feats[:len(dataset)],
             labels=labels)
    print(f'wrote {args.out}: features '
          f'{feats[:len(dataset)].shape}, labels {labels.shape}')


if __name__ == '__main__':
    main()
