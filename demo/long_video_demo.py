#!/usr/bin/env python
"""Sliding-window prediction over a long video, writing an annotated
copy (parity: reference demo/long_video_demo.py:1-265).

A clip buffer slides over the video with ``--stride``; each window is
pushed through the config's val/test pipeline geometry (resize + center
crop + normalize) and the jitted recognizer; the running label is drawn
onto every output frame.
"""
import argparse
import os.path as osp
import sys
from collections import deque

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mscl_tpu import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description='long video demo')
    parser.add_argument('config')
    parser.add_argument('checkpoint', help="checkpoint path or ''")
    parser.add_argument('video')
    parser.add_argument('label', help='label map file')
    parser.add_argument('out_file', help='output video file (.mp4)')
    parser.add_argument('--input-step', type=int, default=1)
    parser.add_argument('--threshold', type=float, default=0.01)
    parser.add_argument('--stride', type=float, default=0.5,
                        help='window stride as a fraction of clip len')
    parser.add_argument('--sample-length', type=int, default=8,
                        help='frames per inference window')
    parser.add_argument('--short-side', type=int, default=128)
    parser.add_argument('--crop-size', type=int, default=112)
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        default={})
    args = parser.parse_args()

    import cv2
    import jax.numpy as jnp
    from mscl_tpu.apis.inference import init_recognizer

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    model, variables, cfg = init_recognizer(cfg,
                                            args.checkpoint or None)
    with open(args.label) as f:
        names = [ln.strip() for ln in f]

    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)

    def prep(frame):
        h, w = frame.shape[:2]
        scale = args.short_side / min(h, w)
        frame = cv2.resize(frame, (int(w * scale), int(h * scale)))
        h, w = frame.shape[:2]
        y0 = (h - args.crop_size) // 2
        x0 = (w - args.crop_size) // 2
        crop = frame[y0:y0 + args.crop_size, x0:x0 + args.crop_size]
        return (cv2.cvtColor(crop, cv2.COLOR_BGR2RGB) - mean) / std

    cap = cv2.VideoCapture(args.video)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(args.out_file,
                             cv2.VideoWriter_fourcc(*'mp4v'), fps,
                             (w, h))
    window = deque(maxlen=args.sample_length)
    stride_frames = max(1, int(args.sample_length * args.stride))
    label_text = ''
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % args.input_step == 0:
            window.append(prep(frame))
            if len(window) == args.sample_length and \
                    (i // args.input_step) % stride_frames == 0:
                clip = np.stack(window)               # (T, H, W, 3)
                imgs = np.transpose(clip, (3, 0, 1, 2))[None, None]
                scores = np.asarray(model.apply(
                    variables, jnp.asarray(imgs, jnp.float32),
                    return_loss=False))[0]
                best = int(scores.argmax())
                if scores[best] >= args.threshold:
                    label_text = f'{names[best]}: {scores[best]:.2f}'
        if label_text:
            cv2.putText(frame, label_text, (10, 30),
                        cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 0, 255), 2)
        writer.write(frame)
        i += 1
    cap.release()
    writer.release()
    print(f'wrote {args.out_file}')


if __name__ == '__main__':
    main()
