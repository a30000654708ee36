#!/usr/bin/env python
"""Re-evaluate saved results against a dataset
(parity: tools/analysis/eval_metric.py)."""
import argparse
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mscl_tpu import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description='Evaluate metrics from '
                                                 'saved results')
    parser.add_argument('config')
    parser.add_argument('results', help='pickle of per-video scores')
    parser.add_argument('--eval', nargs='+',
                        default=['top_k_accuracy'])
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        default={})
    args = parser.parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    from mscl_tpu.datasets import build_dataset
    dataset = build_dataset(dict(cfg.data['test']),
                            default_args=dict(test_mode=True))
    with open(args.results, 'rb') as f:
        results = pickle.load(f)
    metrics = dataset.evaluate(results, metrics=args.eval)
    for k, v in metrics.items():
        print(f'{k}: {v:.4f}')


if __name__ == '__main__':
    main()
