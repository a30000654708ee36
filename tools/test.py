#!/usr/bin/env python
"""Evaluate a checkpoint on a test dataset.

Parity: reference tools/test.py — build test loader, run the forward,
dataset.evaluate(metrics).
"""
import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mscl_tpu import Config, DictAction  # noqa: E402


def parse_args():
    parser = argparse.ArgumentParser(description='Test a recognizer')
    parser.add_argument('config')
    parser.add_argument('checkpoint')
    parser.add_argument('--metrics', nargs='+',
                        default=['top_k_accuracy', 'mean_class_accuracy'])
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

    import jax
    from flax import serialization
    from mscl_tpu.apis import run_test
    from mscl_tpu.apis.train import build_model_from_cfg, \
        example_batch_from
    from mscl_tpu.core import build_lr_schedule, build_optimizer, \
        init_state, load_checkpoint, restore_model_state
    from mscl_tpu.datasets import build_dataloader, build_dataset
    from mscl_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(args.num_devices)
    num_devices = len(mesh.devices.flatten())
    dataset = build_dataset(dict(cfg.data['test']),
                            default_args=dict(test_mode=True))
    loader = build_dataloader(dataset,
                              videos_per_gpu=cfg.data['videos_per_gpu'],
                              num_gpus=num_devices, shuffle=False)

    model = build_model_from_cfg(dict(cfg.model))
    lr = build_lr_schedule(dict(policy='fixed'), 0.0, 1, 1)
    tx = build_optimizer(dict(type='SGD', lr=0.0), lr)
    example = example_batch_from(dataset,
                                 cfg.data['videos_per_gpu'] * num_devices)
    state = init_state(model, tx, example)
    ckpt = load_checkpoint(args.checkpoint)
    state = restore_model_state(state, ckpt)

    results = run_test(model, state, loader, mesh)
    metrics = dataset.evaluate(results, metrics=args.metrics)
    print(json.dumps({k: float(v) for k, v in metrics.items()}, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f)


if __name__ == '__main__':
    main()
