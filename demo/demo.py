#!/usr/bin/env python
"""Classify a single video (parity: reference demo/demo.py:1-209).

Usage:
  python demo/demo.py CONFIG CHECKPOINT VIDEO [LABEL_FILE]
Prints the top-5 (label, score) pairs.
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mscl_tpu import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description='video demo')
    parser.add_argument('config')
    parser.add_argument('checkpoint', help="checkpoint path or ''")
    parser.add_argument('video', help='video file or rawframe dir')
    parser.add_argument('label', nargs='?', default=None,
                        help='label map file, one name per line')
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        default={})
    args = parser.parse_args()

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    from mscl_tpu.apis.inference import (inference_recognizer,
                                         init_recognizer)
    model, variables, cfg = init_recognizer(
        cfg, args.checkpoint or None)
    _, top5 = inference_recognizer(model, variables, cfg, args.video)

    names = None
    if args.label:
        with open(args.label) as f:
            names = [ln.strip() for ln in f]
    print('The top-5 labels with corresponding scores are:')
    for cls, score in top5:
        label = names[cls] if names else str(cls)
        print(f'{label}: {score:.4f}')


if __name__ == '__main__':
    main()
