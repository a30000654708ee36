#!/usr/bin/env python
"""Live spatio-temporal action detection (parity: reference
demo/webcam_demo_spatiotemporal_det.py): a frame buffer slides over the
camera/video stream; every --predict-stepsize frames the AVA detector
scores person boxes (from a proposal pickle keyed by frame index, or
the full frame) and the overlay follows the stream.

With --camera-id pointing at a video file the same loop runs headless.
"""
import argparse
import os.path as osp
import pickle
import sys
from collections import deque

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mscl_tpu import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description='webcam spatio-temporal detection demo')
    parser.add_argument('config')
    parser.add_argument('checkpoint', help="checkpoint path or ''")
    parser.add_argument('--label-map', default=None)
    parser.add_argument('--camera-id', default='0')
    parser.add_argument('--proposals', default=None,
                        help='pickle {frame_idx: (N, 5) xyxy+score}')
    parser.add_argument('--det-score-thr', type=float, default=0.9)
    parser.add_argument('--action-thr', type=float, default=0.4)
    parser.add_argument('--clip-len', type=int, default=4)
    parser.add_argument('--frame-interval', type=int, default=4)
    parser.add_argument('--predict-stepsize', type=int, default=8)
    parser.add_argument('--max-frames', type=int, default=0)
    parser.add_argument('--headless', action='store_true')
    parser.add_argument('--out-file', default=None,
                        help='optionally write the annotated stream')
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

    cam = cv2.VideoCapture(int(args.camera_id)
                           if args.camera_id.isdigit()
                           else args.camera_id)
    writer = None
    window = deque(maxlen=args.clip_len * args.frame_interval)
    variables = None
    current = None
    mean = np.array([123.675, 116.28, 103.53])
    std = np.array([58.395, 57.12, 57.375])
    n = 0
    while True:
        ok, frame = cam.read()
        if not ok:
            break
        h, w = frame.shape[:2]
        if writer is None and args.out_file:
            writer = cv2.VideoWriter(
                args.out_file, cv2.VideoWriter_fourcc(*'mp4v'),
                cam.get(cv2.CAP_PROP_FPS) or 25, (w, h))
        window.append(frame)
        if len(window) == window.maxlen and \
                n % args.predict_stepsize == 0:
            clip = np.stack([
                cv2.cvtColor(window[i], cv2.COLOR_BGR2RGB)
                for i in range(0, len(window), args.frame_interval)])
            clip = (clip - mean) / std
            imgs = np.transpose(clip, (3, 0, 1, 2))[None, None]
            props = proposals.get(n)
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
                    jnp.asarray(imgs, jnp.float32),
                    jnp.asarray(rois), return_loss=False)
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
            current = (props, scores)
        if current is not None:
            for box, sc in zip(*current):
                x1, y1, x2, y2 = [int(v) for v in box]
                cv2.rectangle(frame, (x1, y1), (x2, y2),
                              (0, 255, 0), 2)
                tags = [(c, s) for c, s in enumerate(sc)
                        if c > 0 and s >= args.action_thr][:3]
                for j, (c, s) in enumerate(tags):
                    label = names[c] if names and c < len(names) \
                        else str(c)
                    text = f'{label}: {s:.2f}'
                    cv2.putText(frame, text,
                                (x1, max(0, y1 - 8 - 18 * j)),
                                cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                                (0, 255, 0), 1)
                    if args.headless and n % args.predict_stepsize == 0:
                        print(f'frame {n}: {text}', flush=True)
        if writer is not None:
            writer.write(frame)
        if not args.headless:
            cv2.imshow('mscl_tpu st-det demo', frame)
            if cv2.waitKey(1) & 0xFF == ord('q'):
                break
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    cam.release()
    if writer is not None:
        writer.release()
        print(f'wrote {args.out_file}')
    if not args.headless:
        cv2.destroyAllWindows()


if __name__ == '__main__':
    main()
