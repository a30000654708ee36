#!/usr/bin/env python
"""Convert BSN/BMN proposal output into the SSN classifier's input
proposal format (parity: reference
tools/data/activitynet/convert_proposal_format.py:1-162).

For every video: header `#idx / id / num_frames / fps / num_gts`, one
`label t_start t_end` line per ground truth, then `num_props` and per
proposal `label best_iou best_overlap t_start t_end` — label chosen from
the best-IoU gt, falling back to the best-overlap gt when the IoU label
is background (0), zeros when the proposal hits nothing.
"""
import argparse
import json

import numpy as np


def segment_iou_and_overlap(props, gts):
    """(n_gt, n_prop) temporal IoU and overlap-self (inter / prop len)."""
    ps, pe = props[:, 0][None, :], props[:, 1][None, :]
    gs, ge = gts[:, 0][:, None], gts[:, 1][:, None]
    inter = np.maximum(np.minimum(pe, ge) - np.maximum(ps, gs), 0.)
    union = (pe - ps) + (ge - gs) - inter
    iou = np.where(union > 0, inter / np.maximum(union, 1e-10), 0.)
    overlap = np.where((pe - ps) > 0,
                       inter / np.maximum(pe - ps, 1e-10), 0.)
    return iou, overlap


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--ann-file',
                   default='data/ActivityNet/anet_anno_val.json')
    p.add_argument('--activity-index-file',
                   default='data/ActivityNet/anet_activity_indexes_val.txt')
    p.add_argument('--proposal-file', default='results.json',
                   help='BSN/BMN output json ({"results": {...}})')
    p.add_argument('--formatted-proposal-file',
                   default='anet_val_formatted_proposal.txt')
    args = p.parse_args()

    with open(args.activity_index_file) as f:
        activity_index = {line.strip(): i
                          for i, line in enumerate(f.readlines())}
    with open(args.ann_file) as f:
        anno = json.load(f)
    with open(args.proposal_file) as f:
        results = json.load(f)['results']

    with open(args.formatted_proposal_file, 'w') as out:
        for idx, (video_name, info) in enumerate(anno.items()):
            vid = video_name[2:]  # strip the 'v_' prefix
            if vid not in results:  # ADVICE r4: ref raises KeyError here
                print(f'warning: {vid} missing from proposal results, '
                      'skipping')
                continue
            gts = np.array([[a['segment'][0], a['segment'][1],
                             activity_index[a['label']]]
                            for a in info['annotations']], dtype=float)
            props = np.array([[r['segment'][0], r['segment'][1],
                               r['score']] for r in results[vid]],
                             dtype=float)
            n_gt = gts.shape[0] if gts.size else 0
            n_prop = props.shape[0] if props.size else 0
            out.write(f'#{idx}\n{vid}\n{info["duration_frame"]}\n'
                      f'{info["fps"]}\n{n_gt}\n')
            for g in (gts if n_gt else []):
                out.write(f'{int(g[2])} {g[0]} {g[1]}\n')
            out.write(f'{n_prop}\n')
            if n_prop == 0:
                continue
            if n_gt == 0:
                for i in range(n_prop):
                    out.write(f'0 0 0 {props[i][0]} {props[i][1]}\n')
                continue
            iou, overlap = segment_iou_and_overlap(props[:, :2],
                                                   gts[:, :2])
            bi, bo = iou.max(axis=0), overlap.max(axis=0)
            lab_i = gts[iou.argmax(axis=0), 2].astype(int)
            lab_o = gts[overlap.argmax(axis=0), 2].astype(int)
            for i in range(n_prop):
                label = lab_i[i] if (lab_i[i] == lab_o[i] or
                                     lab_i[i] != 0) else lab_o[i]
                if bi[i] == 0 and bo[i] == 0:
                    out.write(f'0 0 0 {props[i][0]} {props[i][1]}\n')
                else:
                    out.write(f'{label} {bi[i]} {bo[i]} '
                              f'{props[i][0]} {props[i][1]}\n')
    print(f'wrote {args.formatted_proposal_file}')


if __name__ == '__main__':
    main()
