#!/usr/bin/env python
"""Fuse multiple result pickles (score averaging) and report accuracy
(parity: tools/analysis/report_accuracy.py)."""
import argparse
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mscl_tpu.core import mean_class_accuracy, top_k_accuracy  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description='Fuse results')
    parser.add_argument('--scores', nargs='+', required=True,
                        help='result pickles (lists of per-video scores)')
    parser.add_argument('--coefficients', nargs='+', type=float,
                        default=None)
    parser.add_argument('--datalist', required=True,
                        help='annotation txt with labels in last column '
                             'or a pickle with label fields')
    parser.add_argument('--apply-softmax', action='store_true')
    args = parser.parse_args()

    score_sets = []
    for path in args.scores:
        with open(path, 'rb') as f:
            score_sets.append([np.asarray(s) for s in pickle.load(f)])
    coeffs = args.coefficients or [1.0] * len(score_sets)
    assert len(coeffs) == len(score_sets)

    if args.datalist.endswith('.pkl'):
        with open(args.datalist, 'rb') as f:
            annos = pickle.load(f)
        if isinstance(annos, dict):
            annos = list(annos.values())
        labels = [int(a['label']) for a in annos]
    else:
        with open(args.datalist) as f:
            labels = [int(line.split()[-1]) for line in f if line.strip()]

    def softmax(x):
        e = np.exp(x - x.max())
        return e / e.sum()

    fused = []
    for i in range(len(labels)):
        parts = [c * (softmax(s[i]) if args.apply_softmax else s[i])
                 for c, s in zip(coeffs, score_sets)]
        fused.append(sum(parts))

    top1, top5 = top_k_accuracy(fused, labels, (1, 5))
    mca = mean_class_accuracy(fused, labels)
    print(f'top1_acc: {top1:.4f}')
    print(f'top5_acc: {top5:.4f}')
    print(f'mean_class_accuracy: {mca:.4f}')


if __name__ == '__main__':
    main()
