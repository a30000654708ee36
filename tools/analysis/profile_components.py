#!/usr/bin/env python
"""Component-level throughput breakdown for the MSCL pretrain step.

Times (a) the full step, (b) aug only, (c) RGB MoCoV2 tower step only,
(d) flow tower only, (e) plain r3d_18 classifier fwd+bwd — to locate where
the milliseconds go (parity role: tools/analysis/benchmark.py).
"""
import argparse
import os.path as osp
import sys
sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))
import time

import numpy as np


def timeit(fn, *args, warmup=2, steps=10):
    import jax
    args = jax.device_put(args)
    out = None
    def sync(x):
        # block_until_ready is unreliable on the axon remote backend;
        # device_get is the only trustworthy sync
        jax.device_get(jax.tree.leaves(x)[0].ravel()[0])

    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / steps


def timeit_step(step, state, batch, warmup=2, steps=10):
    """Carry the (donated) state like the real train loop."""
    import jax
    batch = jax.device_put(batch)
    for _ in range(warmup):
        state, log_vars = step(state, batch)
    float(jax.device_get(log_vars['loss']))
    t0 = time.time()
    for _ in range(steps):
        state, log_vars = step(state, batch)
    float(jax.device_get(log_vars['loss']))
    return (time.time() - t0) / steps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch-size', type=int, default=32)
    parser.add_argument('--dtype', default='bfloat16')
    parser.add_argument('--parts', nargs='+',
                        default=['aug', 'rgb', 'flow', 'clf', 'full'])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _mscl_batch, _mscl_cfg
    from mscl_tpu.apis.train import build_model_from_cfg
    from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                               init_state, make_train_step)
    from mscl_tpu.models import RECOGNIZERS
    from mscl_tpu.models.common.ssl_aug import SyncMoCoAugmentV5
    from mscl_tpu.models.recognizers import build_ema_fn, \
        sync_key_variables
    from mscl_tpu.models.recognizers.recognizer3d import to_nthwc

    bs = args.batch_size
    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    batch = _mscl_batch(bs)
    lr = build_lr_schedule(dict(policy='fixed'), 0.02, 1, 1)

    def make_tx():
        return build_optimizer(
            dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=1e-4),
            lr, grad_clip=dict(max_norm=40),
            freeze_patterns=('encoder_k', 'neck_k', 'mlp_k'))

    results = {}

    if 'aug' in args.parts:
        aug = SyncMoCoAugmentV5(crop_size=112,
                                sync_level=('batch', 'batch'), t=(8, 8),
                                flow_suffix='flow_imgs', visualize=True)
        im_q = to_nthwc(jnp.asarray(batch['imgs'][0]))
        im_k = to_nthwc(jnp.asarray(batch['imgs'][1]))
        aux = {'flow_imgs_q': to_nthwc(jnp.asarray(batch['flow_imgs'][0])),
               'flow_imgs_k': to_nthwc(jnp.asarray(batch['flow_imgs'][1]))}

        @jax.jit
        def aug_fn(rng, q, k, a):
            q2, k2, a2 = aug(rng, q, k, a)
            return q2.sum() + k2.sum()

        results['aug_ms'] = timeit(aug_fn, jax.random.PRNGKey(0), im_q,
                                   im_k, aux) * 1000

    full_cfg = _mscl_cfg()

    def tower_step(cfg_key, batch_key, label):
        cfg = dict(full_cfg[cfg_key])
        cfg['dtype'] = dtype
        cfg['aug'] = dict(type='IdentityAug')
        model = RECOGNIZERS.get(cfg.pop('type'))(**cfg)
        tb = {'imgs': batch[batch_key] if batch_key == 'imgs' else None}
        if batch_key == 'flow_imgs':
            # visualized flow: 3ch, half the frames
            rngn = np.random.default_rng(0)
            tb = {'imgs': [rngn.uniform(size=(bs, 3, 8, 56, 56))
                           .astype(np.float32) for _ in range(2)]}
        tx = make_tx()
        state = init_state(model, tx, tb,
                           post_init_fn=sync_key_variables)
        step = jax.jit(make_train_step(model, tx, build_ema_fn(model)),
                       donate_argnums=0)
        results[label] = timeit_step(step, state, tb) * 1000

    if 'rgb' in args.parts:
        tower_step('recognizer', 'imgs', 'rgb_tower_ms')
    if 'flow' in args.parts:
        tower_step('recognizer_flow', 'flow_imgs', 'flow_tower_ms')

    if 'clf' in args.parts:
        model = RECOGNIZERS.get('Recognizer3D')(
            backbone=dict(type='torchvision.r3d_18'),
            cls_head=dict(type='I3DHead', num_classes=400,
                          in_channels=512, spatial_type='none',
                          dropout_ratio=0.5),
            dtype=dtype)
        rngn = np.random.default_rng(0)
        cb = {'imgs': rngn.uniform(size=(bs, 1, 3, 8, 112, 112))
              .astype(np.float32),
              'label': rngn.integers(0, 400, size=(bs,))}
        tx = make_tx()
        state = init_state(model, tx, cb)
        step = jax.jit(make_train_step(model, tx), donate_argnums=0)
        results['clf_r3d18_ms'] = timeit_step(step, state, cb) * 1000

    if 'full' in args.parts:
        cfg = dict(full_cfg)
        cfg['dtype'] = dtype
        cfg['recognizer'] = dict(cfg['recognizer'], dtype=dtype)
        cfg['recognizer_flow'] = dict(cfg['recognizer_flow'], dtype=dtype)
        model = build_model_from_cfg(cfg)
        tx = make_tx()
        state = init_state(model, tx, batch,
                           post_init_fn=sync_key_variables)
        step = jax.jit(make_train_step(model, tx, build_ema_fn(model)),
                       donate_argnums=0)
        results['full_step_ms'] = timeit_step(step, state, batch) * 1000

    for k, v in results.items():
        print(f'{k}: {v:.1f}')


if __name__ == '__main__':
    main()
