#!/usr/bin/env python
"""FLOPs/params counter via XLA cost analysis.

Parity: reference tools/analysis/get_flops.py (mmcv FLOPs counter). Here
the numbers come from the compiled HLO's own cost analysis — exact for
the program that actually runs.
"""
import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mscl_tpu import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description='Count FLOPs/params')
    parser.add_argument('config')
    parser.add_argument('--shape', type=int, nargs='+',
                        default=[1, 1, 3, 16, 112, 112],
                        help='input batch shape (NCTHW with clip dim)')
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
    imgs = np.zeros(args.shape, np.float32)
    lr = build_lr_schedule(dict(policy='fixed'), 0.0, 1, 1)
    tx = build_optimizer(dict(type='SGD', lr=0.0), lr)
    state = init_state(model, tx, {'imgs': imgs,
                                   'label': np.zeros((args.shape[0],),
                                                     np.int64)})

    def forward(params, batch_stats, x):
        return model.apply({'params': params, 'batch_stats': batch_stats},
                           x, train=False, return_loss=False)

    lowered = jax.jit(forward).lower(state.params, state.batch_stats,
                                     imgs)
    cost = lowered.compile().cost_analysis()
    flops = cost.get('flops', float('nan'))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))
    print(f'input shape: {tuple(args.shape)}')
    print(f'params: {n_params / 1e6:.2f} M')
    print(f'forward flops (XLA cost analysis): {flops / 1e9:.2f} GFLOPs')


if __name__ == '__main__':
    main()
