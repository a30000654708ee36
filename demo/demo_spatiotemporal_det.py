#!/usr/bin/env python
"""Spatio-temporal action detection demo (parity: reference
demo/demo_spatiotemporal_det.py:1-426).

The reference detects humans with an mmdet Faster-RCNN; here person
proposals come from a pickle ({frame_idx: (N, 5) boxes+scores}) or
default to the full frame. Each keyframe window runs through the
AVAFastRCNN detector; boxes + multilabel actions are drawn onto the
output video.
"""
import argparse
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mscl_tpu import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description='spatio-temporal detection demo')
    parser.add_argument('config')
    parser.add_argument('checkpoint', help="checkpoint path or ''")
    parser.add_argument('video')
    parser.add_argument('out_file')
    parser.add_argument('--label-map', default=None)
    parser.add_argument('--proposals', default=None,
                        help='pickle of {frame_idx: (N, 5) xyxy+score}')
    parser.add_argument('--det-score-thr', type=float, default=0.9)
    parser.add_argument('--action-thr', type=float, default=0.5)
    parser.add_argument('--clip-len', type=int, default=4)
    parser.add_argument('--frame-interval', type=int, default=8)
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        default={})
    args = parser.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from mscl_tpu.apis.train import build_model_from_cfg
    from mscl_tpu.core import load_checkpoint

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    model = build_model_from_cfg(dict(cfg.model))

    names = None
    if args.label_map:
        with open(args.label_map) as f:
            names = [ln.strip() for ln in f]
    proposals = {}
    if args.proposals:
        with open(args.proposals, 'rb') as f:
            proposals = pickle.load(f)

    cap = cv2.VideoCapture(args.video)
    frames = []
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        frames.append(fr)
    cap.release()
    if not frames:
        raise SystemExit(f'no frames in {args.video}')
    h, w = frames[0].shape[:2]

    window = args.clip_len * args.frame_interval
    key_idx = list(range(window // 2, len(frames) - window // 2,
                         args.frame_interval))
    variables = None
    annos = {}
    for kf in key_idx:
        inds = [kf + (i - args.clip_len // 2) * args.frame_interval
                for i in range(args.clip_len)]
        clip = np.stack([
            cv2.cvtColor(frames[int(np.clip(i, 0, len(frames) - 1))],
                         cv2.COLOR_BGR2RGB) for i in inds])
        clip = (clip - np.array([123.675, 116.28, 103.53])) / \
            np.array([58.395, 57.12, 57.375])
        imgs = np.transpose(clip, (3, 0, 1, 2))[None, None]

        props = proposals.get(kf)
        if props is not None:
            props = np.asarray(props, np.float32)
            props = props[props[:, 4] >= args.det_score_thr][:, :4]
        if props is None or len(props) == 0:
            props = np.array([[0, 0, w - 1, h - 1]], np.float32)
        rois = np.concatenate(
            [np.zeros((len(props), 1), np.float32), props], axis=1)

        if variables is None:
            rng = jax.random.PRNGKey(0)
            variables = model.init(
                {'params': rng, 'dropout': rng},
                jnp.asarray(imgs, jnp.float32), jnp.asarray(rois),
                return_loss=False)
            if args.checkpoint:
                ckpt = load_checkpoint(args.checkpoint)
                if 'params' in ckpt:
                    variables = serialization.from_state_dict(
                        dict(variables),
                        {'params': ckpt['params'],
                         'batch_stats': ckpt.get(
                             'batch_stats',
                             variables.get('batch_stats', {}))})
        scores = np.asarray(model.apply(
            variables, jnp.asarray(imgs, jnp.float32),
            jnp.asarray(rois), return_loss=False))
        annos[kf] = (props, scores)

    writer = cv2.VideoWriter(args.out_file,
                             cv2.VideoWriter_fourcc(*'mp4v'),
                             cap.get(cv2.CAP_PROP_FPS) or 25, (w, h))
    current = None
    for i, frame in enumerate(frames):
        nearest = min(annos, key=lambda k: abs(k - i)) if annos else None
        if nearest is not None and abs(nearest - i) <= \
                args.frame_interval:
            current = annos[nearest]
        if current is not None:
            boxes, scores = current
            for b, sc in zip(boxes, scores):
                x1, y1, x2, y2 = [int(v) for v in b]
                cv2.rectangle(frame, (x1, y1), (x2, y2), (0, 255, 0), 2)
                # skip class 0 (background/person-presence in AVA)
                tags = [(c, s) for c, s in enumerate(sc)
                        if c > 0 and s >= args.action_thr][:3]
                for j, (c, s) in enumerate(tags):
                    label = names[c] if names and c < len(names) else \
                        str(c)
                    cv2.putText(frame, f'{label}: {s:.2f}',
                                (x1, max(0, y1 - 8 - 18 * j)),
                                cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                                (0, 255, 0), 1)
        writer.write(frame)
    writer.release()
    print(f'wrote {args.out_file} ({len(key_idx)} keyframes scored)')


if __name__ == '__main__':
    main()
