#!/usr/bin/env python
"""GradCAM demo on a recognizer checkpoint
(parity: reference demo/demo_gradcam_mscl.py).

Renders class-activation overlays for a clip sampled through the config's
test pipeline and writes them as a frame strip png / per-frame jpgs.
"""
import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mscl_tpu import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description='GradCAM demo')
    parser.add_argument('config')
    parser.add_argument('checkpoint')
    parser.add_argument('--video-index', type=int, default=0)
    parser.add_argument('--target-class', type=int, default=None)
    parser.add_argument('--out-dir', default='./gradcam_out')
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        default={})
    args = parser.parse_args()

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    import cv2
    import jax
    from flax import serialization
    from mscl_tpu.apis.train import build_model_from_cfg, \
        example_batch_from
    from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                               init_state, load_checkpoint, restore_model_state)
    from mscl_tpu.datasets import build_dataset
    from mscl_tpu.utils.gradcam import gradcam_3d, overlay_cam

    ds_cfg = dict(cfg.data['test' if 'test' in cfg.data else 'val'])
    ds_cfg['test_mode'] = True
    dataset = build_dataset(ds_cfg)
    sample = dataset[args.video_index]
    imgs = np.asarray(sample['imgs'])[None]  # add batch dim

    model_cfg = {k: v for k, v in dict(cfg.model).items()
                 if k != 'train_cfg'}
    model = build_model_from_cfg(model_cfg)
    lr = build_lr_schedule(dict(policy='fixed'), 0.0, 1, 1)
    tx = build_optimizer(dict(type='SGD', lr=0.0), lr)
    state = init_state(model, tx, {'imgs': imgs,
                                   'label': np.zeros((1,), np.int64)})
    ckpt = load_checkpoint(args.checkpoint)
    state = restore_model_state(state, ckpt)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    cam, scores = gradcam_3d(model, variables, imgs,
                             target_index=args.target_class)
    cam = np.asarray(cam[0])
    pred = int(np.argmax(np.asarray(scores[0])))
    print(f'predicted class: {pred}')

    # de-normalize frames for display
    frames = np.asarray(imgs).reshape(
        (-1,) + imgs.shape[-4:])[0].transpose(1, 2, 3, 0)  # T, H, W, C
    mean = np.array(cfg.get('img_norm_cfg', {}).get(
        'mean', [123.675, 116.28, 103.53]))
    std = np.array(cfg.get('img_norm_cfg', {}).get(
        'std', [58.395, 57.12, 57.375]))
    frames = np.clip(frames * std + mean, 0, 255).astype(np.uint8)

    blended = overlay_cam(frames, cam)
    os.makedirs(args.out_dir, exist_ok=True)
    for i, frame in enumerate(blended):
        cv2.imwrite(osp.join(args.out_dir, f'cam_{i:03d}.jpg'),
                    cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    strip = np.concatenate(list(blended), axis=1)
    cv2.imwrite(osp.join(args.out_dir, 'cam_strip.jpg'),
                cv2.cvtColor(strip, cv2.COLOR_RGB2BGR))
    print(f'wrote {len(blended)} frames to {args.out_dir}')


if __name__ == '__main__':
    main()
