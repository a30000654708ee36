#!/usr/bin/env python
"""Check that every annotated video/frame/flow path decodes
(parity: tools/analysis/check_videos.py)."""
import argparse
import os.path as osp
import pickle
import sys

import cv2

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mscl_tpu.utils.np4 import np4_decode  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description='Check dataset files')
    parser.add_argument('anno', help='annotation pickle or txt')
    parser.add_argument('--check-flow', action='store_true')
    parser.add_argument('--max-videos', type=int, default=None)
    args = parser.parse_args()

    bad = []
    if args.anno.endswith('.pkl'):
        with open(args.anno, 'rb') as f:
            annos = pickle.load(f)
        if isinstance(annos, dict):
            annos = list(annos.values())
        if args.max_videos:
            annos = annos[:args.max_videos]
        for i, a in enumerate(annos):
            frames = a.get('frames', a.get('nori_id_seq', []))
            for p in (frames[:1] + frames[-1:]):
                if cv2.imread(p) is None:
                    bad.append(p)
            if args.check_flow:
                for p in a.get('enc_flows', [])[:1]:
                    try:
                        with open(p, 'rb') as f:
                            if np4_decode(f.read()) is None:
                                bad.append(p)
                    except OSError:
                        bad.append(p)
            if (i + 1) % 100 == 0:
                print(f'{i + 1}/{len(annos)} checked, {len(bad)} bad')
    else:
        with open(args.anno) as f:
            for line in f:
                path = line.split()[0]
                cap = cv2.VideoCapture(path)
                if not cap.isOpened():
                    bad.append(path)
                cap.release()
    print(f'done: {len(bad)} bad entries')
    for p in bad[:50]:
        print('BAD:', p)


if __name__ == '__main__':
    main()
