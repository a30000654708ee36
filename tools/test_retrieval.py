#!/usr/bin/env python
"""Video retrieval evaluation: kNN Recall@{1,5,10,20,50} over pooled
encoder features.

Parity: reference tools/test_retrival.py — build train+test loaders in
test_mode, extract features (feature_extraction forward,
recognizer3d.py:67-93), center + L2-normalize both sets, sim = test @
train^T, Recall@k = any top-k neighbor shares the label
(test_retrival.py:286-304). --ssl skips the explicit checkpoint load so
weights come from the config's ssl_pretrain surgery (:147-148).
"""
import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mscl_tpu import Config, DictAction  # noqa: E402


def parse_args():
    parser = argparse.ArgumentParser(description='Retrieval eval')
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--ssl', action='store_true',
                        help='init from the config ssl_pretrain surgery '
                             'instead of --checkpoint')
    parser.add_argument('--out', help='output result json')
    parser.add_argument('--num-devices', type=int, default=None)
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        default={})
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    from flax import serialization
    from mscl_tpu.apis.inference import (extract_features,
                                         retrieval_recall)
    from mscl_tpu.apis.train import (apply_ssl_pretrain,
                                     build_model_from_cfg,
                                     example_batch_from)
    from mscl_tpu.core import build_lr_schedule, build_optimizer, \
        init_state, load_checkpoint, restore_model_state
    from mscl_tpu.datasets import build_dataloader, build_dataset
    from mscl_tpu.models.recognizers import sync_key_variables
    from mscl_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(args.num_devices)
    num_devices = len(mesh.devices.flatten())

    def make_loader(split):
        ds_cfg = dict(cfg.data[split])
        ds_cfg['test_mode'] = True
        dataset = build_dataset(ds_cfg)
        loader = build_dataloader(
            dataset, videos_per_gpu=cfg.data['videos_per_gpu'],
            num_gpus=num_devices, shuffle=False)
        return dataset, loader

    train_ds, train_loader = make_loader('train')
    test_ds, test_loader = make_loader('test' if 'test' in cfg.data
                                       else 'val')

    model_cfg = dict(cfg.model)
    model = build_model_from_cfg(model_cfg)
    lr = build_lr_schedule(dict(policy='fixed'), 0.0, 1, 1)
    tx = build_optimizer(dict(type='SGD', lr=0.0), lr)
    example = example_batch_from(test_ds,
                                 cfg.data['videos_per_gpu'] * num_devices)

    def post_init(variables):
        ssl_cfg = (model_cfg.get('train_cfg') or {}).get('ssl_pretrain')
        if args.ssl and ssl_cfg:
            variables = apply_ssl_pretrain(dict(variables), dict(ssl_cfg))
        return variables

    state = init_state(model, tx, example, post_init_fn=post_init)
    if args.checkpoint and not args.ssl:
        ckpt = load_checkpoint(args.checkpoint)
        state = restore_model_state(state, ckpt)

    print('extracting train features...')
    train_feats = extract_features(model, state, train_loader, mesh)
    print('extracting test features...')
    test_feats = extract_features(model, state, test_loader, mesh)
    train_labels = [v['label'] for v in train_ds.video_infos]
    test_labels = [v['label'] for v in test_ds.video_infos]

    metrics = retrieval_recall(train_feats, train_labels,
                               test_feats, test_labels)
    print(json.dumps(metrics, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(metrics, f)


if __name__ == '__main__':
    main()
