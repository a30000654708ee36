#!/usr/bin/env python
"""Generate a class-level annotation subset ranked by per-class
accuracy.

Parity: reference tools/data/generate_class_level_subset.py (OSS/refile
edition): from a confusion matrix, select the top-k (or bottom-k)
accuracy classes and emit the annotation subset with remapped labels —
used to build easy/hard class subsets (e.g. the k155 subset).
"""
import argparse
import pickle

import numpy as np


def mean_class_acc(cf_mat):
    cls_cnt = cf_mat.sum(axis=1)
    cls_hit = np.diag(cf_mat)
    acc = [hit / cnt if cnt else 0.0
           for cnt, hit in zip(cls_cnt, cls_hit)]
    return float(np.mean(acc)), acc


def main():
    p = argparse.ArgumentParser()
    p.add_argument('anno_pkl', help='annotation pkl (list of dicts '
                                    'with a label key)')
    p.add_argument('confusion_npy', help='(C, C) confusion matrix')
    p.add_argument('out_pkl')
    p.add_argument('--k', type=int, required=True,
                   help='top-k classes by accuracy; negative = '
                        'bottom-k')
    p.add_argument('--percentage', action='store_true',
                   help='treat |k| as a percentage of classes')
    args = p.parse_args()

    cf = np.load(args.confusion_npy)
    _, acc = mean_class_acc(cf)
    n = len(acc)
    k = abs(args.k)
    if args.percentage:
        k = int(np.ceil(n * k / 100))
    order = np.argsort(acc)
    chosen = order[-k:] if args.k > 0 else order[:k]
    remap = {int(c): i for i, c in enumerate(sorted(chosen))}
    print(f'{len(remap)} classes selected '
          f'(acc {min(acc[c] for c in chosen):.3f}..'
          f'{max(acc[c] for c in chosen):.3f})')

    with open(args.anno_pkl, 'rb') as f:
        annos = pickle.load(f)
    subset = []
    for a in annos:
        lab = int(a['label'])
        if lab in remap:
            a = dict(a, label=remap[lab])
            subset.append(a)
    with open(args.out_pkl, 'wb') as f:
        pickle.dump(subset, f)
    with open(args.out_pkl + '.classmap.pkl', 'wb') as f:
        pickle.dump(remap, f)
    print(f'{len(subset)}/{len(annos)} annotations -> {args.out_pkl}')


if __name__ == '__main__':
    main()
