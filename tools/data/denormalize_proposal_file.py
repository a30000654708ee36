#!/usr/bin/env python
"""Denormalize an SSN 'normalized_' proposal file into frame units.

Parity: reference tools/data/denormalize_proposal_file.py:10-52 —
normalized (fractional) gt/proposal boundaries are multiplied by each
video's frame count (taken from the rawframes directory layout).
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mscl_tpu.localization import load_localize_proposal_file  # noqa


def count_frames(frames_root):
    out = {}
    for name in sorted(os.listdir(frames_root)):
        vdir = osp.join(frames_root, name)
        if osp.isdir(vdir):
            out[name] = len([f for f in os.listdir(vdir)
                             if f.endswith(('.jpg', '.png'))])
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('norm_proposal_file')
    p.add_argument('frames_root', help='rawframes root (frame counts)')
    args = p.parse_args()
    assert 'normalized_' in osp.basename(args.norm_proposal_file)
    out_file = args.norm_proposal_file.replace('normalized_', '')

    frame_counts = count_frames(args.frames_root)
    blocks = []
    infos = load_localize_proposal_file(args.norm_proposal_file)
    for idx, (video_id, _, gts, props) in enumerate(infos):
        n = frame_counts[video_id]
        gt_rows = [f'{int(g[0])} {int(float(g[1]) * n)} '
                   f'{int(float(g[2]) * n)}' for g in gts]
        prop_rows = [
            f'{int(x[0])} {float(x[1]):.04f} {float(x[2]):.04f} '
            f'{int(float(x[3]) * n)} {int(float(x[4]) * n)}'
            for x in props]
        block = [f'# {idx}', video_id, str(n), '1', str(len(gt_rows))]
        block += gt_rows + [str(len(prop_rows))] + prop_rows
        blocks.append('\n'.join(block))
    with open(out_file, 'w') as f:
        f.write('\n'.join(blocks) + '\n')
    print(f'wrote {out_file}')


if __name__ == '__main__':
    main()
