#!/usr/bin/env python
"""Webcam action recognition (parity: reference demo/webcam_demo.py:
1-223): capture thread fills a frame buffer; the jitted recognizer
scores a sliding window; the smoothed top labels overlay the live view.

With --camera-id pointing at a video file (no webcam in headless
environments) the same loop runs over the file.
"""
import argparse
import os.path as osp
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mscl_tpu import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description='webcam demo')
    parser.add_argument('config')
    parser.add_argument('checkpoint', help="checkpoint path or ''")
    parser.add_argument('label', help='label map file')
    parser.add_argument('--camera-id', default='0',
                        help='camera index or video path')
    parser.add_argument('--threshold', type=float, default=0.01)
    parser.add_argument('--average-size', type=int, default=1,
                        help='windows averaged for the displayed label')
    parser.add_argument('--sample-length', type=int, default=8)
    parser.add_argument('--crop-size', type=int, default=112)
    parser.add_argument('--max-frames', type=int, default=0,
                        help='stop after N frames (0 = run forever)')
    parser.add_argument('--headless', action='store_true',
                        help='no cv2 window; print labels to stdout')
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
    cam = cv2.VideoCapture(
        int(args.camera_id) if args.camera_id.isdigit()
        else args.camera_id)

    window = deque(maxlen=args.sample_length)
    score_cache = deque(maxlen=args.average_size)
    n = 0
    while True:
        ok, frame = cam.read()
        if not ok:
            break
        h, w = frame.shape[:2]
        scale = 128 / min(h, w)
        small = cv2.resize(frame, (int(w * scale), int(h * scale)))
        hh, ww = small.shape[:2]
        y0, x0 = (hh - args.crop_size) // 2, (ww - args.crop_size) // 2
        crop = small[y0:y0 + args.crop_size, x0:x0 + args.crop_size]
        window.append(
            (cv2.cvtColor(crop, cv2.COLOR_BGR2RGB) - mean) / std)
        if len(window) == args.sample_length:
            clip = np.transpose(np.stack(window),
                                (3, 0, 1, 2))[None, None]
            scores = np.asarray(model.apply(
                variables, jnp.asarray(clip, jnp.float32),
                return_loss=False))[0]
            score_cache.append(scores)
            avg = np.mean(score_cache, axis=0)
            best = int(avg.argmax())
            if avg[best] >= args.threshold:
                text = f'{names[best]}: {avg[best]:.2f}'
                if args.headless:
                    print(f'[{time.strftime("%H:%M:%S")}] {text}',
                          flush=True)
                else:
                    cv2.putText(frame, text, (10, 30),
                                cv2.FONT_HERSHEY_SIMPLEX, 1.0,
                                (0, 0, 255), 2)
        if not args.headless:
            cv2.imshow('mscl_tpu webcam demo', frame)
            if cv2.waitKey(1) & 0xFF == ord('q'):
                break
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    cam.release()
    if not args.headless:
        cv2.destroyAllWindows()


if __name__ == '__main__':
    main()
