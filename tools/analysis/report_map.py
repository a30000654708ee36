#!/usr/bin/env python
"""Report detection mAP for an ActivityNet proposal file.

Parity: reference tools/analysis/report_map.py — assign a class label to
each class-agnostic proposal (cuhk17_top1: the top-1 video-level label
from the CUHK-17 challenge predictions), dump the detection-format json,
then evaluate temporal-detection mAP at tIoU 0.5:0.05:0.95.

The reference wgets cuhk_anet17_pred.json on demand; in an egress-free
environment pass --cls-pred with a local copy instead.
"""
import argparse
import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mscl_tpu.localization.det_eval import ActivityNetDetection  # noqa: E402


def cuhk17_top1(args):
    """Label every proposal of a video with the CUHK-17 top-1 video
    prediction (reference report_map.py cuhk17_top1)."""
    if not osp.exists(args.cls_pred):
        raise FileNotFoundError(
            f'{args.cls_pred} not found; download '
            'https://download.openmmlab.com/mmaction/localization/'
            'cuhk_anet17_pred.json and pass it via --cls-pred')
    with open(args.proposal) as f:
        proposal = json.load(f)
    with open(args.cls_pred) as f:
        cuhk_pred = json.load(f)['results']
    results = proposal['results']
    for k, v in results.items():
        preds = sorted(cuhk_pred[k], key=lambda x: x['score'])
        top1_label = preds[-1]['label']
        results[k] = [dict(label=top1_label, **item) for item in v]
    proposal['results'] = results
    with open(args.det_output, 'w') as f:
        json.dump(proposal, f)


CLS_FUNCS = {'cuhk17_top1': cuhk17_top1}


def parse_args():
    parser = argparse.ArgumentParser(
        description='Report detection mAP for an ActivityNet proposal '
                    'file')
    parser.add_argument('--proposal', type=str, help='proposal file')
    parser.add_argument('--gt', type=str,
                        default='data/ActivityNet/anet_anno_val.json',
                        help='groundtruth file')
    parser.add_argument('--cls', type=str, default='cuhk17_top1',
                        choices=list(CLS_FUNCS),
                        help='how to assign labels to proposals')
    parser.add_argument('--cls-pred', type=str,
                        default='cuhk_anet17_pred.json',
                        help='video-level classification predictions '
                             '(cuhk_anet17_pred.json)')
    parser.add_argument('--det-output', type=str,
                        default='det_result.json',
                        help='path to store detection results')
    return parser.parse_args()


def main():
    args = parse_args()
    CLS_FUNCS[args.cls](args)
    anet_detection = ActivityNetDetection(
        args.gt, args.det_output,
        tiou_thresholds=np.linspace(0.5, 0.95, 10), verbose=True)
    mAP, average_mAP = anet_detection.evaluate()
    print('[RESULTS] Performance on ActivityNet detection task.')
    print(f'mAP@tIoU {np.linspace(0.5, 0.95, 10)}: {mAP}')
    print(f'Average-mAP: {average_mAP}')


if __name__ == '__main__':
    main()
