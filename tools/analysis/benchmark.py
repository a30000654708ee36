#!/usr/bin/env python
"""Inference speed benchmark of a recognizer config.

Parity: reference tools/analysis/benchmark.py:30-50 — time per-iteration
inference over the test pipeline (data excluded via synthetic batches).
"""
import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mscl_tpu import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description='Benchmark inference')
    parser.add_argument('config')
    parser.add_argument('--log-interval', type=int, default=10)
    parser.add_argument('--iterations', type=int, default=50)
    parser.add_argument('--batch-size', type=int, default=None)
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        default={})
    args = parser.parse_args()

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    import jax
    from mscl_tpu.apis.train import build_model_from_cfg
    from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                               init_state)

    model_cfg = {k: v for k, v in dict(cfg.model).items()
                 if k != 'train_cfg'}
    model = build_model_from_cfg(model_cfg)
    bs = args.batch_size or cfg.data['videos_per_gpu']
    # synthetic clip batch matching the test pipeline's output geometry
    rng = np.random.default_rng(0)
    num_frames = 16
    hw = 112
    imgs = rng.normal(size=(bs, 1, 3, num_frames, hw, hw)).astype(
        np.float32)
    lr = build_lr_schedule(dict(policy='fixed'), 0.0, 1, 1)
    tx = build_optimizer(dict(type='SGD', lr=0.0), lr)
    state = init_state(model, tx, {'imgs': imgs,
                                   'label': np.zeros((bs,), np.int64)})

    @jax.jit
    def forward(params, batch_stats, x):
        return model.apply({'params': params, 'batch_stats': batch_stats},
                           x, train=False, return_loss=False)

    x = jax.device_put(imgs)
    for _ in range(3):
        out = forward(state.params, state.batch_stats, x)
    jax.block_until_ready(out)

    times = []
    for i in range(args.iterations):
        t0 = time.time()
        out = forward(state.params, state.batch_stats, x)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
        if (i + 1) % args.log_interval == 0:
            print(f'iter {i + 1}: {np.mean(times):.4f} s/iter '
                  f'({bs / np.mean(times):.1f} videos/s)')
    print(f'overall: {np.mean(times):.4f} s/iter, '
          f'{bs / np.mean(times):.1f} videos/s')


if __name__ == '__main__':
    main()
