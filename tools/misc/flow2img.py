#!/usr/bin/env python
"""Convert stored flow blobs into color-wheel flow images + motion
pseudo-boxes.

Parity: reference tools/misc/flow2img.py (nori/redis edition) — decode
each video's .np4 flow blobs, (a) render color-wheel flow JPEGs
(`imflows` key, the precomputed alternative to on-device
FlowVisualizer), (b) run the flow->bbox + DP smoothing pipeline
(mscl_tpu/flow/flow_bbox.py) and store per-frame gt_bboxes + quality
stats into the annotation pkl.
"""
import argparse
import os
import os.path as osp
import pickle
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mscl_tpu.flow.flow_bbox import inference_bboxs  # noqa: E402
from mscl_tpu.utils.flow_viz import flow_to_image  # noqa: E402
from mscl_tpu.utils.np4 import np4_decode  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('anno_pkl', help='annotations with enc_flows paths')
    p.add_argument('out_root', help='output dir for flow jpegs')
    p.add_argument('anno_out', help='updated annotation pkl')
    p.add_argument('--gap', type=int, default=2)
    p.add_argument('--adjacent', type=int, default=8)
    p.add_argument('--with-bboxes', action='store_true')
    p.add_argument('--num-shards', type=int, default=1)
    p.add_argument('--shard-index', type=int, default=0)
    args = p.parse_args()

    with open(args.anno_pkl, 'rb') as f:
        annos = pickle.load(f)
    os.makedirs(args.out_root, exist_ok=True)

    for idx in range(args.shard_index, len(annos), args.num_shards):
        anno = annos[idx]
        name = anno.get('video_name', f'video_{idx}')
        vout = osp.join(args.out_root, name)
        os.makedirs(vout, exist_ok=True)
        flows = []
        img_paths = []
        for fi, fp in enumerate(anno.get('enc_flows', [])):
            with open(fp, 'rb') as f:
                flow = np4_decode(f.read())
            flows.append(flow)
            img = flow_to_image(flow)
            out_path = osp.join(vout, f'flowimg_{fi:05d}.jpg')
            cv2.imwrite(out_path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            img_paths.append(out_path)
        anno['imflows'] = img_paths
        if args.with_bboxes and flows:
            n_frames = len(anno.get('frames', [])) or \
                (len(flows) * args.gap + args.adjacent)
            boxes, picked, stats = inference_bboxs(
                n_frames, flows, gap=args.gap, adjacent=args.adjacent)
            anno['gt_bboxes'] = np.asarray(boxes, np.float32)
            anno['bbox_freq'] = stats[0]
            anno['bbox_picked_freq'] = float(stats[2])
            anno['corner_bbox_freq'] = float(stats[4])
        if (idx + 1) % 20 == 0:
            print(f'{idx + 1}/{len(annos)}')

    with open(args.anno_out, 'wb') as f:
        pickle.dump(annos, f)
    print(f'wrote {args.anno_out}')


if __name__ == '__main__':
    main()
